"""BasicStorage: format-validated batch/stream IO + MERGE upsert.

Reference: /root/reference/jorvik/storage/basic.py:10-267 (read :15-41,
readStream :43-69, write :71-104, writeStream :106-134, merge :136-191,
_merge_schema :193-220, exists :222-254, observers :256-267).

Spark-first re-expression, with two deliberate deviations (SURVEY.md
Appendix A): Q2 — streaming writes notify observers *after* ``start()``
(the reference notifies before); Q3 — ``readStream`` accepts a declared
schema and skips the batch-inference read when one is given.

MERGE without Delta
-------------------
This container has no delta-spark, so ``merge`` delegates to the Delta
MERGE API only when the package is importable AND the target is a Delta
table; otherwise it executes the same semantics natively over the stored
format via relational reconstruction:

    kept     = target rows with no (condition-satisfying) source match
    updated  = matched target rows where update_condition holds → source row
    inserted = unmatched source rows where insert_condition holds

one shuffle join on the merge keys + one anti join, then an atomic
swap-in of the rewritten table (write to temp dir → rename via the Hadoop
FileSystem API, so the same code works on HDFS/S3A/local). Multiple source
rows updating one target row raise, exactly like Delta MERGE.

At 100 TB the native path is a full-table rewrite per merge — correct but
write-amplified; the production recommendation is a transactional format
(Delta/Iceberg), which this method automatically uses when available.
"""

from __future__ import annotations

from typing import List, Union

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from jorvik_spark.audit import schemas
from jorvik_spark.storage.protocols import OutputObserver

try:  # delta-spark is optional; all Delta behavior is gated on this.
    from delta import DeltaTable

    _HAS_DELTA = True
except ImportError:
    DeltaTable = None
    _HAS_DELTA = False

FORMATS = ("delta", "parquet", "json", "csv", "orc")

# Format used when merge() must create a missing target. The reference is
# delta-only here; without delta-spark we keep MERGE first-class on parquet.
_MERGE_CREATE_FORMAT = "delta" if _HAS_DELTA else "parquet"

_MATCH = "__jorvik_merge_match__"
_FID = "__jorvik_merge_fid__"
# Distinctive raise_error payload for the in-plan multi-match guard;
# merge() translates it back into the contract's ValueError.
_MULTI_MATCH_MARKER = "JORVIK_MERGE_MULTI_MATCH"


def _check_format(format: str) -> None:
    if format not in FORMATS:
        raise ValueError(f"Unsupported format: {format}")
    if format == "delta" and not _HAS_DELTA:
        raise ValueError(
            "Format 'delta' requires the delta-spark package, which is not "
            "installed. Use 'parquet' (merge-capable here) or install delta-spark."
        )


def _active_session() -> SparkSession:
    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("No active SparkSession.")
    return spark


class BasicStorage:
    """Path-addressed lake storage over the active SparkSession."""

    def __init__(self):
        self.output_observers: List[OutputObserver] = []

    # -- batch ------------------------------------------------------------

    def read(self, path: str, format: str = "parquet", options: dict = None) -> DataFrame:
        """Batch scan (reference basic.py:15-41). CSV defaults to
        header=True + inferSchema=True."""
        _check_format(format)
        spark = _active_session()
        options = dict(options or {})
        if format == "csv":
            options.setdefault("header", True)
            options.setdefault("inferSchema", True)
        return spark.read.format(format).options(**options).load(path)

    def write(
        self,
        df: DataFrame,
        path: str,
        format: str = "parquet",
        mode: str = "append",
        partition_fields: Union[str, List[str]] = "",
        options: dict = None,
    ) -> None:
        """Batch sink (reference basic.py:71-104). ``overwrite`` implies
        overwriteSchema=true (quirk Q8, kept); observers notified after save."""
        _check_format(format)
        options = dict(options or {})
        if format == "csv":
            options.setdefault("header", True)
            options.setdefault("delimiter", ",")

        writer = df.write.format(format)
        if mode == "overwrite":
            writer = writer.option("overwriteSchema", "true")
        if partition_fields:
            writer = writer.partitionBy(partition_fields)
        writer.options(**options).mode(mode).save(path)
        self.notify_output_observers(df, path)

    # -- streaming --------------------------------------------------------

    def readStream(
        self,
        path: str,
        format: str = "parquet",
        options: dict = None,
        schema=None,
    ) -> DataFrame:
        """Streaming scan (reference basic.py:43-69). Non-Delta file streams
        need a schema: the declared one when given (Q3 fix), else inferred
        by a one-off batch read of the same path."""
        _check_format(format)
        spark = _active_session()
        reader = spark.readStream
        if format != "delta":
            reader = reader.schema(schema or self.read(path, format, options).schema)
        reader = reader.format(format)
        if options:
            reader = reader.options(**options)
        return reader.load(path)

    def writeStream(
        self,
        df: DataFrame,
        path: str,
        format: str = "parquet",
        checkpoint: str = None,
        partition_fields: Union[str, List[str]] = "",
        options: dict = None,
    ) -> StreamingQuery:
        """Streaming sink with mandatory checkpoint (reference
        basic.py:106-134). Observers notified after ``start()`` (Q2 fix)."""
        _check_format(format)
        if not checkpoint:
            raise ValueError("writeStream requires a checkpoint location.")
        writer = df.writeStream.format(format)
        if partition_fields:
            writer = writer.partitionBy(partition_fields)
        if options:
            writer = writer.options(**options)
        query = writer.option("checkpointLocation", checkpoint).start(path)
        self.notify_output_observers(df, path)
        return query

    # -- merge ------------------------------------------------------------

    def merge(
        self,
        df: DataFrame,
        path: str,
        merge_condition: str,
        partition_fields: Union[str, List[str]] = "",
        merge_schemas: bool = False,
        update_condition: Union[str, bool, None] = None,
        insert_condition: Union[str, bool, None] = None,
        delete_condition: Union[str, bool, None] = None,
    ) -> None:
        """Conditional upsert of ``df`` (alias ``incremental``) into the
        table at ``path`` (alias ``full``) — reference basic.py:136-191.

        * ``update_condition`` / ``insert_condition``: optional SQL over the
          two aliases; ``False`` disables that branch entirely; all
          branches disabled raises ValueError.
        * ``delete_condition`` (engine extension beyond the reference
          surface, backward-compatible): SQL over the two aliases; a
          MATCHED target row satisfying it is DELETED. Delete takes
          precedence over update (Delta clause order: ``whenMatchedDelete``
          added first), which is the CDC-apply contract — an incremental
          row flagged ``op = 'D'`` removes the target row even if the
          update condition would also hold. ``None`` (default) preserves
          the reference's exact upsert-only behavior.
        * Missing target → plain overwrite write (table creation). Kept
          reference-faithful (basic.py:169-174): the conditions do NOT
          apply on creation, so the first merge writes every incremental
          row even under an insert_condition — callers needing a filtered
          bootstrap (or a delete-flag-free bootstrap) must pre-filter or
          create the table first.
        * Schema drift → ValueError unless ``merge_schemas=True`` (null-fill
          both directions, reference basic.py:193-220).
        """
        if isinstance(update_condition, bool):
            update_condition = str(update_condition).lower()
        if isinstance(insert_condition, bool):
            insert_condition = str(insert_condition).lower()
        if isinstance(delete_condition, bool):
            delete_condition = str(delete_condition).lower()
        if update_condition == insert_condition == "false" and (
            delete_condition is None or delete_condition == "false"
        ):
            raise ValueError(
                "Inserts, updates, and deletes are all ignored; this "
                "operation would have no effect."
            )

        self._recover_interrupted_swap(path)
        if not self.exists(path):
            self.write(
                df,
                path,
                format=_MERGE_CREATE_FORMAT,
                mode="overwrite",
                partition_fields=partition_fields,
            )
            return

        spark = _active_session()
        if _HAS_DELTA and DeltaTable.isDeltaTable(spark, path):
            df = self._merge_schema(df, path, "delta", merge_schemas)
            builder = (
                DeltaTable.forPath(spark, path)
                .alias("full")
                .merge(df.alias("incremental"), merge_condition)
            )
            if delete_condition is not None:
                # first clause added = first evaluated: delete precedence
                builder = builder.whenMatchedDelete(delete_condition)
            (
                builder.whenMatchedUpdateAll(update_condition)
                .whenNotMatchedInsertAll(insert_condition)
                .execute()
            )
            self.notify_output_observers(df, path)
            return

        # Native path: same semantics reconstructed relationally on parquet.
        fmt = "parquet"
        try:
            full = self.read(path, format=fmt)
        except AnalysisException as e:
            raise ValueError(
                "The given path is not a mergeable table "
                f"(unreadable as {fmt}): {e}"
            ) from e

        df = self._merge_schema(df, path, fmt, merge_schemas, current_table=full)
        full = self._null_fill_new_fields(full, df)
        out_cols = [f.name for f in full.schema.fields]

        tgt = full.withColumn(_FID, F.monotonically_increasing_id()).alias("full")
        src = df.withColumn(_MATCH, F.lit(True)).alias("incremental")

        joined = tgt.join(src, F.expr(merge_condition), "left")
        matched = F.col(f"incremental.{_MATCH}").isNotNull()
        # coalesce: a NULL condition (e.g. "incremental.op = 'D'" with a
        # null op) means the clause does NOT fire — Delta's semantics. A
        # bare NULL here would flow into filter(~__del__) below, where
        # ~NULL = NULL silently DROPS the target row (data loss).
        del_ok = matched & (
            F.coalesce(F.expr(delete_condition), F.lit(False))
            if delete_condition is not None
            else F.lit(False)
        )
        # delete precedence over update — same clause order as the Delta
        # path (whenMatchedDelete added before whenMatchedUpdateAll)
        upd_ok = (
            matched
            & ~del_ok
            & (
                F.expr(update_condition)
                if update_condition is not None
                else F.lit(True)
            )
        )
        joined = joined.withColumn("__del__", del_ok).withColumn(
            "__upd__", upd_ok
        )

        # Delta MERGE raises when several source rows would apply a matched
        # clause to the same target row; reproduce that contract. r18
        # (guide §1.2 / r17 VERDICT #5): the guard is FOLDED into the
        # rewrite plan instead of running as its own count action — the
        # old two-action form (guard count, then write) had to persist
        # the joined frame so both actions saw one
        # monotonically_increasing_id assignment, paying a full extra
        # materialization per merge (measured 1.53-1.71 s → see
        # OPTIMIZATION_r18.md). Now a guarded filter raises from inside
        # the single write action BEFORE any row is dropped (delete
        # multi-matches included — the guard sits above the ~__del__
        # filter), the raise surfaces before any rename in
        # _atomic_overwrite (the target is untouched on failure; the
        # partial __tmp__ dir is overwritten by the next merge), and the
        # marker is translated back to the contract's ValueError below.
        w = Window.partitionBy(F.col(f"full.{_FID}"))
        joined = joined.withColumn(
            "__n_upd__",
            F.sum((F.col("__upd__") | F.col("__del__")).cast("int")).over(w),
        )

        # One output row per target row: the applying source row if any
        # (clause flags sort True first), dropped entirely when that
        # clause is the delete, else the original row once. The guard is
        # folded into the __rn__ VALUE, not a filter predicate: every
        # joined row — delete-flagged ones included — evaluates it in
        # the projection above the Window, before either filter can drop
        # the row, so no predicate reordering can skip the raise (and
        # the ~__del__ filter cannot be pushed below the Window anyway:
        # it is not a partition-key predicate).
        pick = Window.partitionBy(F.col(f"full.{_FID}")).orderBy(
            F.col("__del__").desc(), F.col("__upd__").desc()
        )
        rn_guarded = F.when(
            F.col("__n_upd__") <= 1, F.row_number().over(pick)
        ).otherwise(
            F.expr(f"raise_error('{_MULTI_MATCH_MARKER}')").cast("int")
        )
        kept_or_updated = (
            joined.withColumn("__rn__", rn_guarded)
            .filter(F.col("__rn__") == 1)
            .filter(~F.col("__del__"))
            .select(
                [
                    F.when(F.col("__upd__"), F.col(f"incremental.{c}"))
                    .otherwise(F.col(f"full.{c}"))
                    .alias(c)
                    for c in out_cols
                ]
            )
        )

        inserts = df.alias("incremental").join(
            full.alias("full"), F.expr(merge_condition), "left_anti"
        )
        if insert_condition is not None:
            inserts = inserts.filter(F.expr(insert_condition))
        result = kept_or_updated.unionByName(inserts.select(out_cols))

        try:
            self._atomic_overwrite(result, path, fmt, partition_fields)
        except Exception as e:  # noqa: BLE001 — marker-translated below
            if _MULTI_MATCH_MARKER in str(e):
                raise ValueError(
                    "Multiple source rows matched and would update the same "
                    "target row (merge condition is not selective enough)."
                ) from e
            raise
        self.notify_output_observers(df, path)

    def _merge_schema(
        self,
        df: DataFrame,
        path: str,
        format: str,
        merge_schemas: bool,
        current_table: DataFrame = None,
    ) -> DataFrame:
        """Null-fill schema evolution (reference basic.py:193-220).

        Fields missing from the incremental side are added as typed nulls;
        new incremental fields are null-filled into the stored table (the
        Delta branch rewrites it — without the reference's bogus
        ``replaceWhere`` option, quirk Q9; the native branch evolves the
        in-memory target, materialized by the merge rewrite itself).
        """
        current = (
            current_table
            if current_table is not None
            else self.read(path, format=format)
        )
        if schemas.are_equal(df.schema, current.schema):
            return df

        current_names = {f.name for f in current.schema.fields}
        incoming_names = {f.name for f in df.schema.fields}
        new = [f for f in df.schema.fields if f.name not in current_names]
        missing = [f for f in current.schema.fields if f.name not in incoming_names]

        if not merge_schemas:
            raise ValueError(
                "Incremental data have a different schema.\n"
                f"New fields: {new}\nMissing fields: {missing}"
            )

        for f in missing:
            df = df.withColumn(f.name, F.lit(None).cast(f.dataType))

        if new and format == "delta":
            for f in new:
                current = current.withColumn(f.name, F.lit(None).cast(f.dataType))
            self.write(
                current, path, format="delta", mode="overwrite",
                options={"mergeSchema": "true"},
            )
        return df

    @staticmethod
    def _null_fill_new_fields(full: DataFrame, df: DataFrame) -> DataFrame:
        """Add incremental-only fields to the target as typed nulls."""
        have = {f.name for f in full.schema.fields}
        for f in df.schema.fields:
            if f.name not in have:
                full = full.withColumn(f.name, F.lit(None).cast(f.dataType))
        return full

    def _recover_interrupted_swap(self, path: str) -> None:
        """Roll forward a crash inside :meth:`_atomic_overwrite`'s rename
        pair: if the table is missing but its ``…__old__`` copy exists, the
        previous merge died between rename (2) and (3) — restore the old
        copy as the table. Without this, a retried merge would see a
        missing target, rebuild the table from the incremental rows alone,
        and later delete the only full copy as a "stale leftover"."""
        spark = _active_session()
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        HPath = jvm.org.apache.hadoop.fs.Path
        old = HPath(path.rstrip("/") + "__jorvik_merge_old__")
        # No blanket except around the probe: if getFileSystem/exists
        # throws (transient FS/credential error), we CANNOT know whether
        # an interrupted swap left the table aside — silently skipping
        # recovery would let the retrying merge "create" the table from
        # the incremental batch alone and later delete the __old__ copy
        # as a stale leftover: permanent loss of the full table, the
        # exact scenario this roll-forward exists to prevent. Failing the
        # merge loudly is the only safe answer to an unanswerable probe.
        fs = HPath(path).getFileSystem(hconf)
        if fs.exists(old) and not fs.exists(HPath(path)):
            if not fs.rename(old, HPath(path)):
                raise IOError(
                    f"Found interrupted merge swap but could not "
                    f"restore {old} -> {path}"
                )

    def _atomic_overwrite(
        self,
        result: DataFrame,
        path: str,
        format: str,
        partition_fields: Union[str, List[str]] = "",
    ) -> None:
        """Rewrite ``path`` with ``result`` while ``result`` still reads
        from ``path``: materialize into a temp sibling, then swap via the
        Hadoop FileSystem API (portable across local/HDFS/S3A).

        Swap protocol is rename-aside, so a crash at any step leaves a
        recoverable table: (1) write to ``…__tmp__``; (2) rename ``path``
        → ``…__old__``; (3) rename ``…__tmp__`` → ``path`` (restoring
        ``…__old__`` on failure); (4) delete ``…__old__``. The table is
        absent only inside the (2)–(3) rename pair — never deleted before
        its replacement exists. Note HDFS/local renames are atomic but
        the pair is not one transaction; object stores without atomic
        rename (raw S3) want a manifest-committer or Delta instead.
        """
        spark = _active_session()
        base = path.rstrip("/")
        tmp = base + "__jorvik_merge_tmp__"
        old = base + "__jorvik_merge_old__"
        writer = result.write.format(format).mode("overwrite")
        if partition_fields:
            writer = writer.partitionBy(partition_fields)
        writer.save(tmp)

        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        HPath = jvm.org.apache.hadoop.fs.Path
        fs = HPath(path).getFileSystem(hconf)
        fs.delete(HPath(old), True)  # stale leftover from a prior crash
        if fs.exists(HPath(path)) and not fs.rename(HPath(path), HPath(old)):
            raise IOError(f"Swap failed: could not move {path} aside")
        if not fs.rename(HPath(tmp), HPath(path)):
            fs.rename(HPath(old), HPath(path))  # restore the original
            raise IOError(f"Swap failed: could not rename {tmp} -> {path}")
        fs.delete(HPath(old), True)

    # -- existence --------------------------------------------------------

    def exists(self, path: str) -> bool:
        """3-tier path probe (reference basic.py:222-254): Delta check when
        available → Hadoop FileSystem.exists → text-read sniff. Directory
        existence counts even when empty (quirk Q7, kept — tests rely on it).
        """
        spark = _active_session()
        if _HAS_DELTA and DeltaTable.isDeltaTable(spark, path):
            return True
        try:
            sc = spark.sparkContext
            jvm = sc._jvm
            hpath = jvm.org.apache.hadoop.fs.Path(path)
            # The path's OWN filesystem, not the default FS: with a local/
            # HDFS default, FileSystem.get(conf) throws Wrong-FS for every
            # s3a://... path and forces the slow tier-3 text-read sniff —
            # and exists() sits on the hot path of every isolated read.
            fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
            return fs.exists(hpath)
        except Exception:
            pass
        try:
            spark.read.format("text").load(path)
            return True
        except AnalysisException as e:
            if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                return False
            raise

    # -- observers --------------------------------------------------------

    def register_output_observer(self, observer: OutputObserver) -> None:
        """Subscribe to (df, output_path) write events (basic.py:256-262)."""
        self.output_observers.append(observer)

    def notify_output_observers(self, df: DataFrame, output_path: str) -> None:
        for observer in self.output_observers:
            observer.update(df, output_path)
