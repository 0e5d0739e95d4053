"""Streaming sinks beyond the plain file sink (A4).

``foreach_batch_merge`` composes the streaming source (A2) with the MERGE
upsert (A5) into the reference-shaped "streaming upsert" deployment: each
micro-batch is applied transactionally to the target table through
``storage.merge``, so replays (at-least-once sources, checkpoint
recovery) converge instead of duplicating — the standard CDC/late-data
sink pattern.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from jorvik_spark.storage.protocols import Storage


def foreach_batch_merge(
    df: DataFrame,
    storage: Storage,
    path: str,
    merge_condition: str,
    checkpoint: str,
    update_condition: Union[str, bool, None] = None,
    insert_condition: Union[str, bool, None] = None,
    trigger_available_now: bool = True,
    dedup_keys: Union[list, None] = None,
) -> StreamingQuery:
    """Start a streaming query that MERGEs every micro-batch into ``path``.

    Replay-safety has two halves. Across micro-batches, MERGE converges
    (re-applying the same rows produces the same end state). WITHIN a
    micro-batch, an at-least-once source can deliver the same key twice —
    which MERGE either rejects (multiple source rows matching one target)
    or double-inserts — so pass ``dedup_keys`` (the merge-key columns) to
    keep the last arrival per key before merging. Without ``dedup_keys``
    the caller is asserting the source is exactly-once per batch.
    """
    if not checkpoint:
        raise ValueError("foreach_batch_merge requires a checkpoint location.")

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if dedup_keys:
            batch_df = batch_df.dropDuplicates(dedup_keys)
        storage.merge(
            batch_df,
            path,
            merge_condition,
            update_condition=update_condition,
            insert_condition=insert_condition,
        )

    writer = df.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
