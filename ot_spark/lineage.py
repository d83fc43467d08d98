"""Per-partition lineage records + exact resume (north_rule requirement).

The reference is a single-process tool whose only resumability is "re-run
the whole file"; the graft mandates: every partition emits a lineage record
(cell range, row count, checksum) to a checkpoint table enabling exact
resume.  Implemented as idempotent batch-with-checkpoint (SURVEY.md §2.7 —
deliberately NOT Structured Streaming):

- the output is partitioned by (bucket, run): ``bucket=<b>/run=<run_id>/``
  — cells of one bucket co-locate, bucket count bounds task/file counts
  independent of data scale, and a committed (bucket, run) directory is
  IMMUTABLE: no later run ever writes into it, so snapshots that pin
  (bucket, run) pairs return byte-identical content forever (Iceberg's
  data-file pinning, expressed as partition dirs);
- a write first anti-joins buckets already present in the lineage table
  (broadcast — lineage is tiny), writes only the remainder under its own
  ``run=<run_id>`` subdirs, then appends one lineage row per completed
  bucket: ``(run_id, bucket, cell_min, cell_max, row_count, checksum,
  files, ts)`` — ``files`` lists the data files, manifest-style;
- checksum is ``bit_xor(xxhash64(key cols))`` — order-insensitive,
  overflow-free (ANSI-safe), cheap in codegen;
- resume = call the same function again: completed buckets are skipped
  exactly, partial buckets are rewritten under the new run_id;
- CURRENT state = :func:`read_current` (semi-join on lineage's
  (bucket, run) pairs).  Files from crashed runs that never reached
  lineage are ORPHANS: invisible to every read path, reclaimed by
  :func:`remove_orphans` (Iceberg's orphan-file maintenance).

Crash-safety argument: the lineage row for a bucket is appended only after
the bucket's files are committed; a crash in between leaves the bucket
absent from lineage -> next run rewrites it under a fresh run dir and the
half-written files are orphaned, never read.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "cell_bucket"
RUN_COL = "run"


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
    audit_input: bool = False,
) -> dict:
    """Write df partitioned by (cell bucket, run) with lineage; skips
    buckets the lineage table already records. Returns summary counters.

    ``table_props``: properties persisted alongside the output (replication
    timestamp analog) — survive resume because the sidecar write is
    idempotent overwrite.

    ``audit_input``: lineage facts normally come from a read-back of the
    committed files, which audits POST-COMMIT drift but cannot see a
    write-time input-vs-disk divergence.  Setting this recomputes the
    global (count, checksum) from the INPUT frame too (one extra pass over
    the upstream DAG — the cost the read-back exists to avoid; use at
    validation scale, not per-commit at 100 TB) and raises if the disk
    disagrees."""
    spark = df.sparkSession
    run_id = run_id or uuid.uuid4().hex[:12]
    bucketed = with_bucket(df, cell_col, n_buckets)

    done = completed_buckets(spark, lineage_path)
    skipped = 0
    if done is not None:
        skipped = done.count()
        bucketed = bucketed.join(F.broadcast(done), BUCKET_COL, "left_anti")

    # idempotency: every run writes only under its own run=<id> subdirs, so
    # committed (bucket, run) dirs are never touched; a half-written bucket
    # from a crashed run is re-written under the NEW run id and the crashed
    # files become unreferenced orphans (see remove_orphans).  Dynamic
    # overwrite keeps a same-run_id retry from duplicating its own files.
    #
    # hash-distribute on bucket before the partitioned write (Iceberg's
    # write.distribution-mode=hash): without it every upstream task emits
    # a file into every bucket dir — tasks x buckets small files, the
    # classic partitioned-write explosion at 100 TB (and measurably most
    # of this write's cost at gate scale).  One shuffle, one file per
    # (bucket, run).  No explicit partition count: repartition(n, col) pins
    # REPARTITION_BY_NUM, which disables AQE coalescing/skew-splitting on
    # this exchange — column-only keeps it REPARTITION_BY_COL so AQE can
    # rebalance straggler buckets; each bucket still hashes to exactly one
    # reducer, preserving one file per (bucket, run).
    bucketed.repartition(F.col(BUCKET_COL)).withColumn(
        RUN_COL, F.lit(run_id)
    ).write.option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy(BUCKET_COL, RUN_COL).mode("overwrite").parquet(out_dir)

    # lineage facts come from a READ-BACK of the committed bucket files, not
    # from re-evaluating the input DAG (which would run the whole upstream
    # pipeline again for the agg and a third time for the count — the
    # round-2 3x-compute finding).  Reading what actually landed also makes
    # the checksum an integrity audit of the files themselves.  Restrict to
    # THIS run's subdirs == exactly the buckets this run committed.
    try:
        # _metadata is a hidden column: select it at the scan (it does not
        # survive joins) so the lineage row can list its data files
        landed = (
            spark.read.parquet(out_dir)
            .select("*", F.col("_metadata.file_path").alias("__file"))
            .where(F.col(RUN_COL) == run_id)
        )
    except AnalysisException:  # empty input wrote no files at all; any
        # other read failure propagates (round-3 advice: a swallowed
        # transient error silently recorded "nothing written")
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
                F.collect_set(F.col("__file")).alias("files"),
            )
            .withColumn("run_id", F.lit(run_id))
            .withColumn("ts", F.lit(int(time.time() * 1000)))
        ).persist()
        written = lineage.count()
        if written:
            lineage.coalesce(1).write.mode("append").parquet(lineage_path)
        if audit_input:
            want = bucketed.agg(
                F.count(F.lit(1)).alias("n"),
                F.bit_xor(F.xxhash64(*key_cols)).alias("h"),
            ).first()
            got = lineage.agg(
                F.sum("row_count").alias("n"),
                F.bit_xor("checksum").alias("h"),
            ).first()
            if (want["n"], want["h"]) != (got["n"] or 0, got["h"]):
                raise RuntimeError(
                    f"write-time divergence: input (rows={want['n']}, "
                    f"checksum={want['h']}) vs committed files "
                    f"(rows={got['n']}, checksum={got['h']})"
                )
        lineage.unpersist()
    elif audit_input:
        want = bucketed.agg(F.count(F.lit(1)).alias("n")).first()
        if want["n"]:
            raise RuntimeError(
                f"write-time divergence: input had {want['n']} rows but "
                f"no files landed"
            )
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
        BUCKET_COL, "cell_min", "cell_max", "row_count", "checksum",
        "run_id", "files",
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


def _pinned_read(spark: SparkSession, out_dir: str, pins: DataFrame) -> DataFrame:
    """Data restricted to the (bucket, run) pairs in ``pins`` — partition
    pruning makes this touch only the pinned directories; the run column is
    dropped so reader-facing schema stays stable."""
    pairs = pins.select(
        BUCKET_COL, F.col("run_id").alias(RUN_COL)
    ).distinct()
    return (
        spark.read.parquet(out_dir)
        .join(F.broadcast(pairs), [BUCKET_COL, RUN_COL], "left_semi")
        .drop(RUN_COL)
    )


def read_current(spark: SparkSession, out_dir: str, lineage_path: str) -> DataFrame:
    """CURRENT table state: the (bucket, run) pairs the lineage table
    records.  Orphaned files from crashed runs are invisible here."""
    return _pinned_read(spark, out_dir, spark.read.parquet(lineage_path))


def read_as_of(spark: SparkSession, out_dir: str, snapshot_id: int) -> DataFrame:
    """Time-travel read: exactly the (bucket, run) directories committed as
    of ``snapshot_id``.  Committed run dirs are immutable, so this returns
    byte-identical CONTENT even after a later rewrite of the same bucket
    (full Iceberg data-file pinning, not just membership)."""
    return _pinned_read(
        spark, out_dir, read_manifest(spark, out_dir, snapshot_id)
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
    """Audit: recompute per-bucket count+checksum from the files the
    lineage table pins and join back; returns rows that disagree (empty =
    intact).  Detects POST-COMMIT drift (lost/corrupted files); write-time
    input-vs-disk divergence is ``write_with_lineage(audit_input=True)``'s
    job — the read-back-derived checksum here can't see it by
    construction."""
    out = read_current(spark, out_dir, lineage_path)
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


def orphan_files(spark: SparkSession, out_dir: str, lineage_path: str) -> list[str]:
    """Data files under ``out_dir`` that no lineage row references —
    leftovers of runs that crashed between data commit and lineage append.
    Invisible to every read path; listed here for reclamation."""
    on_disk = (
        spark.read.parquet(out_dir)
        .select(F.col("_metadata.file_path").alias("f"))
        .distinct()
    )
    referenced = (
        spark.read.parquet(lineage_path)
        .select(F.explode("files").alias("f"))
        .distinct()
    )
    return [
        r["f"] for r in on_disk.join(referenced, "f", "left_anti").collect()
    ]


def remove_orphans(spark: SparkSession, out_dir: str, lineage_path: str) -> int:
    """Delete orphaned data files (Iceberg's remove_orphan_files
    maintenance).  Driver-local fs deletes — fine in this sandbox; on a
    cluster the same listing would feed the object store's batch delete."""
    orphans = orphan_files(spark, out_dir, lineage_path)
    for f in orphans:
        path = f[7:] if f.startswith("file://") else f
        if os.path.exists(path):
            os.remove(path)
    return len(orphans)
