"""Managed-table storage layer — SURVEY §2.2 sinks (K1 upsert, K2
truncate-load, K3 field-level update, K4 partitioned bronze, K6 layout).

The reference's MongoDB collections become parquet-backed managed tables
under a warehouse root; every mutation is expressed as a *set-oriented
merge* keyed on the table's primary key (url/name → here a generic
``key``), replacing per-record ``update_one(..., upsert=True)`` loops
(mongo_io_manager.py:81-104).

Write protocol: jobs never mutate in place — they write a new table
version to a side directory and atomically swap the table symlink-style
(rename).  On a real deployment this layer is the one-file swap for a
transactional format (Delta/Iceberg ``MERGE INTO``); the operator and job
layers above only see DataFrames in / DataFrames out.

Scale notes: `merge_upsert` is one left_anti join on the key — with the
updates side small (a work batch) it broadcast-joins against the target
scan and rewrites only matching partitions' worth of data; `partition_by`
on lifecycle/date columns keeps the rewrite bounded (K6's index analog).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Warehouse:
    """A directory of parquet tables with versioned atomic replacement."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        return os.path.isdir(self.path(table))

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    # -- K2: truncate-and-load ------------------------------------------------
    def overwrite(self, df: DataFrame, table: str, *, partition_by: list[str] | None = None) -> None:
        """Full replace via write-aside + swap (never reads-while-writing)."""
        tmp = self.path(f".{table}.tmp-{uuid.uuid4().hex[:8]}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        final = self.path(table)
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.rename(tmp, final)

    # -- K1: keyed upsert (merge) --------------------------------------------
    def merge_upsert(
        self,
        updates: DataFrame,
        table: str,
        key: list[str],
        *,
        partition_by: list[str] | None = None,
    ) -> None:
        """``MERGE``: rows matching on ``key`` are replaced wholesale by the
        update row, new keys are inserted (mongo upsert semantics,
        mongo_io_manager.py:85-89).  Idempotent: re-merging the same batch
        is a no-op.  Plan: target ⟕(left_anti) updates ∪ updates — one join,
        with the batch side broadcast when small.

        With ``partition_by``, the merge is PARTITION-SCOPED: only the
        partitions present in the update batch are read, rewritten, and
        swapped — the untouched rest of a 100 TB table is never touched
        (this is what makes a keyed merge viable at scale on plain
        parquet; a transactional format's ``MERGE INTO`` is the drop-in
        upgrade).  Contract: the key must be partition-stable (a key never
        moves between partition values — e.g. url → ingest date); a key
        that migrated would leave its old copy alive in an untouched
        partition."""
        if not self.exists(table):
            self.overwrite(updates, table, partition_by=partition_by)
            return
        if partition_by:
            self._merge_upsert_partitioned(updates, table, key, partition_by)
            return
        target = self.read(table)
        kept = target.join(F.broadcast(updates.select(*key)), key, "left_anti")
        merged = kept.unionByName(updates, allowMissingColumns=True)
        self.overwrite(merged, table, partition_by=partition_by)

    def _merge_upsert_partitioned(
        self, updates: DataFrame, table: str, key: list[str], partition_by: list[str]
    ) -> None:
        """Partition-scoped merge: build the merged slice for the affected
        partitions aside (no read-while-overwrite on the live table), then
        atomically swap ONLY those partition directories.

        The affected-partition list is a driver collect of the update
        batch's distinct partition tuples — bounded by the batch, not the
        table (a work batch touches a handful of partitions).  The kept
        scan filters on those values, so partition pruning limits the read
        to the same handful of directories."""
        target = self.read(table)
        cond = self._partition_filter(updates, partition_by)
        if cond is None:
            return
        kept = target.filter(cond).join(
            F.broadcast(updates.select(*key)), key, "left_anti"
        )
        merged = kept.unionByName(updates, allowMissingColumns=True)
        self._swap_partitions(merged, table, partition_by)

    def _partition_filter(self, batch: DataFrame, partition_by: list[str]):
        """OR-of-ANDs predicate selecting exactly the partitions present in
        ``batch`` (driver collect of the batch's distinct partition tuples —
        bounded by the batch, not the table), or None for an empty batch.
        Partition pruning turns it into a directory listing."""
        parts = batch.select(*partition_by).distinct().collect()
        cond = None
        for row in parts:
            c = None
            for col in partition_by:
                eq = F.col(col).eqNullSafe(F.lit(row[col]))
                c = eq if c is None else (c & eq)
            cond = c if cond is None else (cond | c)
        return cond

    def _swap_partitions(
        self, slice_df: DataFrame, table: str, partition_by: list[str]
    ) -> None:
        """Write a partitioned slice aside (no read-while-overwrite on the
        live table) and atomically swap only its partition directories in."""
        aside = self.path(f".{table}.merge-{uuid.uuid4().hex[:8]}")
        slice_df.write.mode("overwrite").partitionBy(*partition_by).parquet(aside)
        final = self.path(table)
        try:
            for rel in self._partition_dirs(aside, len(partition_by)):
                dst = os.path.join(final, rel)
                if os.path.isdir(dst):
                    shutil.rmtree(dst)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.rename(os.path.join(aside, rel), dst)
        finally:
            shutil.rmtree(aside, ignore_errors=True)

    @staticmethod
    def _partition_dirs(root: str, depth: int) -> list[str]:
        """Relative ``col=value[/col=value...]`` leaf partition paths under
        ``root`` at exactly ``depth`` levels (Spark's hive-style layout)."""
        rels = [""]
        for _ in range(depth):
            nxt = []
            for rel in rels:
                base = os.path.join(root, rel) if rel else root
                for d in os.listdir(base):
                    if "=" in d and os.path.isdir(os.path.join(base, d)):
                        nxt.append(os.path.join(rel, d) if rel else d)
            rels = nxt
        return rels

    # -- K3: field-level update ($set of derived columns) ---------------------
    def merge_update(
        self,
        delta: DataFrame,
        table: str,
        key: list[str],
        set_cols: list[str],
        *,
        partition_by: list[str] | None = None,
    ) -> None:
        """``WHEN MATCHED UPDATE SET c = delta.c``: only ``set_cols`` change,
        all other columns ride along; unmatched target rows are untouched;
        delta rows without a target match are dropped (the reference's
        ``$set`` never inserts).  This is each pipeline stage's write-back
        (summary/validation_score, embedding_status, audio ids,
        related_ids — SURVEY §2.2 K3).

        With ``partition_by`` the update is PARTITION-SCOPED like
        :meth:`merge_upsert`: the delta must carry the partition columns
        (a work batch read from the same table always does), and only the
        partitions its rows live in are read, rewritten and swapped."""
        if partition_by:
            missing = [c for c in partition_by if c not in delta.columns]
            if missing:
                raise ValueError(
                    f"partition-scoped merge_update needs partition cols "
                    f"{missing} in the delta"
                )
        target = self.read(table)
        if partition_by:
            cond = self._partition_filter(delta, partition_by)
            if cond is None:
                return
            target = target.filter(cond)
        d = delta.select(*key, *[F.col(c).alias(f"__new_{c}") for c in set_cols])
        joined = target.join(F.broadcast(d), key, "left")
        out_cols = []
        for c in target.columns:
            if c in set_cols:
                out_cols.append(F.coalesce(F.col(f"__new_{c}"), F.col(c)).alias(c))
            else:
                out_cols.append(F.col(c))
        updated = joined.select(*out_cols)
        if partition_by:
            self._swap_partitions(updated, table, partition_by)
        else:
            self.overwrite(updated, table, partition_by=partition_by)

    # -- K6: bucketed layout (co-located joins, shuffle-free at read time) ----
    def write_bucketed(
        self,
        df: DataFrame,
        table: str,
        key: list[str],
        *,
        buckets: int = 32,
    ) -> None:
        """Hash-bucketed, bucket-sorted table registered in the session
        catalog — the 100 TB replacement for the reference's B-tree indexes
        (K6, mongo_io_manager.py:46-51) on the JOIN side: two tables
        bucketed on the same key with the same bucket count sort-merge-join
        with NO exchange on either side, so the recurring big joins
        (articles ⋈ embeddings ⋈ related) pay their shuffle once at write
        time instead of per query.  Bucket pruning also serves point
        lookups (S6): an equality predicate on the key scans one bucket —
        but ONLY while the scan is actually bucketed: the
        ``spark.sql.sources.bucketing.autoBucketedScan.enabled`` heuristic
        silently demotes bucketed scans (and their pruning) when no
        join/agg would benefit, so pin it ``false`` for lookup workloads
        (plan-verified in tests/test_storage_jobs.py).

        Requires a catalog table (bucket metadata lives in the metastore),
        so this writes through ``saveAsTable`` with an explicit path under
        the warehouse root; read it back with :meth:`read_catalog`.
        """
        (
            df.write.mode("overwrite")
            .format("parquet")
            .bucketBy(buckets, *key)
            .sortBy(*key)
            .option("path", self.path(table))
            .saveAsTable(table)
        )

    def read_catalog(self, table: str) -> DataFrame:
        """Read a catalog-registered (e.g. bucketed) table — bucket layout
        is only honored via the catalog, not a bare parquet path scan."""
        return self.spark.table(table)

    # -- training-shard export (dataset delivery) ------------------------------
    def write_training_shards(
        self,
        df: DataFrame,
        table: str,
        *,
        rows_per_shard: int,
    ) -> int:
        """Materialize a training dataset as uniformly-sized parquet shards
        — the delivery step after curation/packing (X38–X40): data-loader
        work units want even shards, not whatever file sizes the last
        shuffle produced.  One count job sizes the layout, a round-robin
        repartition evens the rows, and ``maxRecordsPerFile`` caps any
        shard the writer splits.  Returns the shard count."""
        import math

        n = df.count()
        shards = max(1, math.ceil(n / rows_per_shard))
        (
            df.repartition(shards)
            .write.mode("overwrite")
            .option("maxRecordsPerFile", rows_per_shard)
            .parquet(self.path(table))
        )
        return shards

    # -- K4: bronze snapshot (partitioned append-style JSON/parquet) ----------
    def write_bronze(self, df: DataFrame, table: str, run_id: str) -> str:
        """Raw snapshot under ``bronze/{table}/run_id={run_id}/`` — the S3
        ``raw_data/{source}/{run_id}/...`` layout (s3_io_manager.py:24-47)
        with partition directories instead of pickled objects."""
        path = os.path.join(self.root, "bronze", table, f"run_id={run_id}")
        df.write.mode("overwrite").parquet(path)
        return path
