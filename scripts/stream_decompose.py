"""Per-stage decomposition of the three streaming drains (r17 VERDICT #4).

Splits each drain into its stages — source-prep write, stream drain
(machinery + state), read-back, driver collect — and times each, so the
"floor" claim is a measured decomposition instead of an assertion.

Optionally A/Bs a scoped spark.sql.shuffle.partitions for the drain
stage (--stream-shuffle N): stateful streaming state-store instance
count follows shuffle partitions, so a tiny-state drain pays per-
partition checkpoint/HDFS-state-file overhead 1:1 with that conf.

Usage: python scripts/stream_decompose.py [--runs N] [--stream-shuffle N]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from jorvik_spark.session import get_session  # noqa: E402
from jorvik_spark.storage.basic import BasicStorage  # noqa: E402
from jorvik_spark.tables import load_table  # noqa: E402
from jorvik_spark.queries.storage_ops import _scratch, _ORDER_COLS  # noqa: E402


def timed(label, fn, acc):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    acc.setdefault(label, []).append(dt)
    return out


def drain_dedup_watermark(spark, sf_dir, acc, stream_shuffle=None):
    st = BasicStorage()
    base = _scratch("sdedup_dx")
    src, dst, cp = f"{base}/src", f"{base}/dst", f"{base}/cp"
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    timed(
        "dedup_wm/1_src_write",
        lambda: st.write(events.unionAll(events), src, "parquet", "overwrite"),
        acc,
    )

    def run_stream():
        stream = (
            st.readStream(src, "parquet")
            .withWatermark("ts", "1 hour")
            .dropDuplicatesWithinWatermark(["event_id"])
        )
        q = st.writeStream(stream, dst, "parquet", checkpoint=cp)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    old = spark.conf.get("spark.sql.shuffle.partitions")
    if stream_shuffle:
        spark.conf.set("spark.sql.shuffle.partitions", str(stream_shuffle))
    try:
        timed("dedup_wm/2_stream_drain", run_stream, acc)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    back = st.read(dst, "parquet").select("event_id", "ts", "user_id", "value")
    timed(
        "dedup_wm/3_readback_noop",
        lambda: back.write.format("noop").mode("overwrite").save(),
        acc,
    )
    timed("dedup_wm/4_collect", lambda: back.collect(), acc)


def drain_foreachbatch_merge(spark, sf_dir, acc, stream_shuffle=None):
    from jorvik_spark.streaming.sinks import foreach_batch_merge

    st = BasicStorage()
    base = _scratch("fbmerge_dx")
    target, src, ckpt = base + "/t", base + "/src", base + "/ckpt"
    orders = load_table(spark, sf_dir, "orders").select(*_ORDER_COLS)
    timed(
        "fbmerge/1_target_write",
        lambda: st.write(
            orders.filter(F.col("o_orderkey") % 3 != 0),
            target, "parquet", "overwrite",
        ),
        acc,
    )
    incremental = (
        orders.filter(F.col("o_orderkey") % 2 == 0)
        .withColumn("o_orderstatus", F.lit("R"))
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    timed(
        "fbmerge/2_src_write",
        lambda: st.write(incremental, src, "parquet", "overwrite"),
        acc,
    )

    def run_stream():
        q = foreach_batch_merge(
            st.readStream(src, "parquet"),
            st,
            target,
            "full.o_orderkey == incremental.o_orderkey",
            checkpoint=ckpt,
            dedup_keys=["o_orderkey"],
        )
        q.awaitTermination()

    old = spark.conf.get("spark.sql.shuffle.partitions")
    if stream_shuffle:
        spark.conf.set("spark.sql.shuffle.partitions", str(stream_shuffle))
    try:
        timed("fbmerge/3_stream_merge_drain", run_stream, acc)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    back = st.read(target, "parquet")
    timed(
        "fbmerge/4_readback_noop",
        lambda: back.write.format("noop").mode("overwrite").save(),
        acc,
    )
    timed("fbmerge/5_collect", lambda: back.collect(), acc)


def drain_stateful_totals(spark, sf_dir, acc, stream_shuffle=None):
    from pyspark.sql import Window

    from jorvik_spark.streaming.ops import running_user_totals_fixedpoint

    st = BasicStorage()
    base = _scratch("sstate_dx")
    src, dst, cp = f"{base}/src", f"{base}/dst", f"{base}/cp"
    events = load_table(spark, sf_dir, "events").select("user_id", "value")
    timed(
        "stateful/1_src_write",
        lambda: st.write(events, src, "parquet", "overwrite"),
        acc,
    )

    def run_stream():
        out = running_user_totals_fixedpoint(st.readStream(src, "parquet"))

        def sink(batch_df, _batch_id):
            batch_df.write.mode("append").parquet(dst)

        q = (
            out.writeStream.foreachBatch(sink)
            .option("checkpointLocation", cp)
            .outputMode("update")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    old = spark.conf.get("spark.sql.shuffle.partitions")
    if stream_shuffle:
        spark.conf.set("spark.sql.shuffle.partitions", str(stream_shuffle))
    try:
        timed("stateful/2_stream_drain", run_stream, acc)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

    back = spark.read.parquet(dst)
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        back.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_u")
    )
    timed("stateful/3_final_select_collect", lambda: final.collect(), acc)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--stream-shuffle", type=int, default=None)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_CPUS", cpus)
    spark = get_session("jorvik_stream_dx", master=f"local[{cpus}]")

    acc: dict[str, list[float]] = {}
    for i in range(args.runs):
        drain_dedup_watermark(spark, args.sf, acc, args.stream_shuffle)
        drain_foreachbatch_merge(spark, args.sf, acc, args.stream_shuffle)
        drain_stateful_totals(spark, args.sf, acc, args.stream_shuffle)
        print(f"-- pass {i + 1} done (load {os.getloadavg()[0]:.2f})",
              file=sys.stderr)
    print(f"stream_shuffle={args.stream_shuffle or 'session default'}")
    for label in sorted(acc):
        runs = [round(x, 3) for x in acc[label]]
        print(f"{label:34s} median {statistics.median(runs):7.3f}  runs {runs}")


if __name__ == "__main__":
    main()
