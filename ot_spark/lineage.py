"""Per-partition lineage records + exact resume (north_rule requirement).

The reference is a single-process tool whose only resumability is "re-run
the whole file"; the graft mandates: every partition emits a lineage record
(cell range, row count, checksum) to a checkpoint table enabling exact
resume.  Implemented as idempotent batch-with-checkpoint (SURVEY.md §2.7 —
deliberately NOT Structured Streaming):

- the output is partitioned by a bucket column (grid-cell bucket by
  default: ``grid_cell % n_buckets`` — cells of one bucket co-locate, and
  bucket count bounds task/file counts independent of data scale);
- a write first anti-joins buckets already present in the lineage table
  (broadcast — lineage is tiny), writes only the remainder with DYNAMIC
  partition overwrite (re-running a half-finished bucket replaces, never
  duplicates), then appends one lineage row per completed bucket:
  ``(run_id, bucket, cell_min, cell_max, row_count, checksum, ts)``;
- checksum is ``bit_xor(xxhash64(key cols))`` — order-insensitive,
  overflow-free (ANSI-safe), cheap in codegen;
- resume = call the same function again: completed buckets are skipped
  exactly, partial buckets are rewritten idempotently.

Crash-safety argument: the lineage row for a bucket is appended only after
the bucket's files are committed; a crash in between leaves the bucket
absent from lineage -> next run rewrites it via dynamic overwrite.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "cell_bucket"


def with_bucket(df: DataFrame, cell_col: str = "grid_cell", n_buckets: int = 64) -> DataFrame:
    """NULL cells (no coords / poles) go to bucket -1."""
    return df.withColumn(
        BUCKET_COL,
        F.coalesce(F.pmod(F.col(cell_col), F.lit(n_buckets)), F.lit(-1)).cast("int"),
    )


def _lineage_exists(spark: SparkSession, lineage_path: str) -> bool:
    # local-fs check is fine in this sandbox; on a cluster this would be a
    # catalog/Iceberg-metadata lookup
    return os.path.exists(lineage_path)


PROPS_SUBDIR = "_properties"  # leading underscore: Spark readers skip it


def write_table_properties(spark: SparkSession, out_dir: str, props: dict) -> None:
    """Persist table properties (the osmosis_replication_timestamp analog,
    /root/reference/src/utils.rs:4-8) as a tiny parquet sidecar under the
    output dir — scheme-agnostic (no driver-local fs ops), invisible to
    readers of the data dir itself."""
    rows = [(str(k), str(v)) for k, v in sorted(props.items())]
    spark.createDataFrame(rows or [("", "")], "key string, value string").where(
        F.col("key") != ""
    ).coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/{PROPS_SUBDIR}")


def read_table_properties(spark: SparkSession, in_dir: str) -> dict:
    try:
        rows = spark.read.parquet(f"{in_dir}/{PROPS_SUBDIR}").collect()
    except Exception:  # noqa: BLE001 — absent sidecar == no properties
        return {}
    return {r["key"]: r["value"] for r in rows}


def propagate_table_properties(
    spark: SparkSession, in_dir: str, out_dir: str, extra: dict | None = None
) -> dict:
    """input -> output property carry-through, mirroring the reference's
    end-to-end replication-timestamp preservation
    (tests/integration_test.rs:267-291)."""
    props = read_table_properties(spark, in_dir)
    props.update(extra or {})
    if props:
        write_table_properties(spark, out_dir, props)
    return props


def completed_buckets(spark: SparkSession, lineage_path: str) -> DataFrame | None:
    if not _lineage_exists(spark, lineage_path):
        return None
    return spark.read.parquet(lineage_path).select(BUCKET_COL).distinct()


def write_with_lineage(
    df: DataFrame,
    out_dir: str,
    lineage_path: str,
    key_cols: list[str],
    cell_col: str = "grid_cell",
    n_buckets: int = 64,
    run_id: str | None = None,
    table_props: dict | None = None,
    snapshot: bool = True,
) -> dict:
    """Write df partitioned by cell bucket with lineage; skips buckets the
    lineage table already records. Returns summary counters.

    ``table_props``: properties persisted alongside the output (replication
    timestamp analog) — survive resume because the sidecar write is
    idempotent overwrite."""
    spark = df.sparkSession
    run_id = run_id or uuid.uuid4().hex[:12]
    bucketed = with_bucket(df, cell_col, n_buckets)

    done = completed_buckets(spark, lineage_path)
    skipped = 0
    if done is not None:
        skipped = done.count()
        bucketed = bucketed.join(F.broadcast(done), BUCKET_COL, "left_anti")

    # idempotency: DYNAMIC partition overwrite — only the buckets present in
    # this (anti-joined) frame are replaced, so a half-written bucket from a
    # crashed run is rewritten exactly once and completed buckets are never
    # touched.  Works on any filesystem scheme (no driver-local fs ops).
    bucketed.write.option("partitionOverwriteMode", "dynamic").partitionBy(
        BUCKET_COL
    ).mode("overwrite").parquet(out_dir)

    # lineage facts come from a READ-BACK of the committed bucket files, not
    # from re-evaluating the input DAG (which would run the whole upstream
    # pipeline again for the agg and a third time for the count — the
    # round-2 3x-compute finding).  Reading what actually landed also makes
    # the checksum an integrity audit of the files themselves.  Restrict to
    # buckets NOT already in lineage == exactly the buckets this run wrote.
    try:
        landed = spark.read.parquet(out_dir)
    except Exception:  # noqa: BLE001 — empty input wrote no files at all
        landed = None
    written = 0
    if landed is not None:
        if done is not None:
            landed = landed.join(F.broadcast(done), BUCKET_COL, "left_anti")
        lineage = (
            landed.groupBy(BUCKET_COL)
            .agg(
                F.min(cell_col).alias("cell_min"),
                F.max(cell_col).alias("cell_max"),
                F.count(F.lit(1)).alias("row_count"),
                F.bit_xor(F.xxhash64(*key_cols)).alias("checksum"),
            )
            .withColumn("run_id", F.lit(run_id))
            .withColumn("ts", F.lit(int(time.time() * 1000)))
        ).persist()
        written = lineage.count()
        if written:
            lineage.coalesce(1).write.mode("append").parquet(lineage_path)
        lineage.unpersist()
    if table_props:
        write_table_properties(spark, out_dir, table_props)
    snap_id = None
    if snapshot and _lineage_exists(spark, lineage_path):
        snap_id = _append_snapshot(
            spark, out_dir, lineage_path, run_id, written, skipped
        )
    return {
        "run_id": run_id,
        "buckets_written": written,
        "buckets_skipped": skipped,
        "snapshot_id": snap_id,
    }


# ------------------------------------------------------- snapshot surface
# The graft's input_hint names an Iceberg table; without Iceberg jars in the
# sandbox we keep the SPIRIT of its metadata model on plain parquet: every
# write_with_lineage commit appends a snapshot row (id, parent, ts,
# operation, summary) to ``<out>/_snapshots`` and a manifest under
# ``<out>/_manifests/snap=<id>`` listing the buckets (files) VISIBLE at that
# snapshot with row counts + checksums — enabling time-travel reads of table
# membership and snapshot-pinned integrity audits for resume.  Underscore
# prefixes keep both invisible to readers of the data dir.

SNAPSHOTS_SUBDIR = "_snapshots"
MANIFESTS_SUBDIR = "_manifests"


def snapshots(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """The snapshot log (newest last), or None for a never-committed table."""
    try:
        return spark.read.parquet(f"{out_dir}/{SNAPSHOTS_SUBDIR}").orderBy(
            "snapshot_id"
        )
    except Exception:  # noqa: BLE001 — absent log == no snapshots
        return None


def current_snapshot_id(spark: SparkSession, out_dir: str) -> int | None:
    snaps = snapshots(spark, out_dir)
    if snaps is None:
        return None
    row = snaps.agg(F.max("snapshot_id").alias("m")).first()
    return row.m


def _append_snapshot(
    spark: SparkSession,
    out_dir: str,
    lineage_path: str,
    run_id: str,
    written: int,
    skipped: int,
) -> int:
    parent = current_snapshot_id(spark, out_dir)
    snap_id = (parent or 0) + 1
    # manifest = full lineage state AS OF this commit (cumulative bucket
    # membership — Iceberg's manifest-list role); tiny: one row per bucket
    lin = spark.read.parquet(lineage_path).select(
        BUCKET_COL, "cell_min", "cell_max", "row_count", "checksum", "run_id"
    )
    lin.coalesce(1).write.mode("overwrite").parquet(
        f"{out_dir}/{MANIFESTS_SUBDIR}/snap={snap_id}"
    )
    row = [(
        snap_id,
        parent,
        int(time.time() * 1000),
        "append" if skipped else "overwrite",
        run_id,
        written,
        skipped,
    )]
    spark.createDataFrame(
        row,
        "snapshot_id long, parent_id long, ts long, operation string, "
        "run_id string, buckets_written long, buckets_skipped long",
    ).coalesce(1).write.mode("append").parquet(f"{out_dir}/{SNAPSHOTS_SUBDIR}")
    return snap_id


def read_manifest(spark: SparkSession, out_dir: str, snapshot_id: int) -> DataFrame:
    return spark.read.parquet(
        f"{out_dir}/{MANIFESTS_SUBDIR}/snap={snapshot_id}"
    )


def read_as_of(spark: SparkSession, out_dir: str, snapshot_id: int) -> DataFrame:
    """Time-travel read: the data restricted to buckets that were committed
    as of ``snapshot_id``.  Bucket CONTENT is current (dynamic overwrite
    rewrites in place — documented departure from full Iceberg data
    versioning); membership and the audit below are snapshot-exact."""
    buckets = read_manifest(spark, out_dir, snapshot_id).select(BUCKET_COL)
    return spark.read.parquet(out_dir).join(
        F.broadcast(buckets), BUCKET_COL, "left_semi"
    )


def audit_snapshot(
    spark: SparkSession, out_dir: str, snapshot_id: int, key_cols: list[str]
) -> DataFrame:
    """Snapshot-pinned integrity audit: recompute count+checksum of every
    bucket visible at ``snapshot_id`` from the CURRENT files and return the
    rows that disagree with that snapshot's manifest (empty == the resume
    state recorded then is still intact on disk)."""
    man = read_manifest(spark, out_dir, snapshot_id).select(
        BUCKET_COL, "row_count", "checksum"
    )
    actual = (
        read_as_of(spark, out_dir, snapshot_id)
        .groupBy(BUCKET_COL)
        .agg(
            F.count(F.lit(1)).alias("actual_rows"),
            F.bit_xor(F.xxhash64(*key_cols)).alias("actual_checksum"),
        )
    )
    return actual.join(man, BUCKET_COL, "full").where(
        ~F.col("actual_rows").eqNullSafe(F.col("row_count"))
        | ~F.col("actual_checksum").eqNullSafe(F.col("checksum"))
    )


def verify_against_lineage(
    spark: SparkSession, out_dir: str, lineage_path: str, key_cols: list[str]
) -> DataFrame:
    """Audit: recompute per-bucket count+checksum from the output and join
    against the lineage table; returns rows that disagree (empty = intact)."""
    out = spark.read.parquet(out_dir)
    actual = out.groupBy(BUCKET_COL).agg(
        F.count(F.lit(1)).alias("actual_rows"),
        F.bit_xor(F.xxhash64(*key_cols)).alias("actual_checksum"),
    )
    lin = spark.read.parquet(lineage_path).select(
        BUCKET_COL, "row_count", "checksum"
    )
    return actual.join(lin, BUCKET_COL, "full").where(
        ~F.col("actual_rows").eqNullSafe(F.col("row_count"))
        | ~F.col("actual_checksum").eqNullSafe(F.col("checksum"))
    )
