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


def _tiny_df(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """Single-partition DataFrame for metadata-log writes.

    ``createDataFrame(local_rows)`` slices the rows into defaultParallelism
    LocalTableScan partitions; pulling those through ``coalesce(1)`` costs
    ~150 ms PER SLICE in local mode (measured: every one-row metadata write
    took ~5 s at local[32], regardless of sink format — the bulk of
    snapshot_read's round-5 regression).  parallelize(rows, 1) pins ONE
    slice at creation: no coalesce, no shuffle, one task."""
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)


def _local_fs_path(path: str) -> str | None:
    """Local filesystem path for ``path``, or None for a remote URI."""
    p = path[7:] if path.startswith("file://") else path
    return None if "://" in p else p


_ARROW_TYPES: dict[str, object] = {}


def _arrow_schema(ddl: str):
    import pyarrow as pa

    types = {
        "long": pa.int64(), "bigint": pa.int64(),
        "int": pa.int32(), "string": pa.string(),
    }
    fields = []
    for part in ddl.split(","):
        name, typ = part.strip().split()
        fields.append(pa.field(name, types[typ]))
    return pa.schema(fields)


def _write_tiny(
    spark: SparkSession, rows: list, ddl: str, path: str, mode: str = "append"
) -> None:
    """Append/overwrite a tiny metadata log.

    Iceberg writes table metadata DRIVER-SIDE (through FileIO), never as
    cluster jobs — the symmetric twin of ``_meta_rows``'s local read
    fast-path.  Each metadata write issued as a Spark job pays whole-job
    scheduling latency to move a handful of rows (measured ~0.15 s per
    write at local[32]; a snapshot commit does three of them).  Local
    paths write one parquet file via pyarrow with an EXPLICIT arrow
    schema derived from the same DDL the Spark fallback uses, so footer
    types are identical whichever path wrote a given file; non-local
    URIs (s3://, hdfs://) fall back to the one-task Spark write."""
    local = _local_fs_path(path)
    if local is None:
        df = _tiny_df(spark, rows, ddl)
        df.write.mode(mode).parquet(path)
        return
    import shutil
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = _arrow_schema(ddl)
    cols = {
        f.name: [r[i] for r in rows] for i, f in enumerate(schema)
    }
    table = pa.table(cols, schema=schema)
    if mode == "overwrite" and os.path.exists(local):
        shutil.rmtree(local)
    os.makedirs(local, exist_ok=True)
    pq.write_table(
        table, os.path.join(local, f"part-{_uuid.uuid4().hex}.parquet")
    )


def write_table_properties(spark: SparkSession, out_dir: str, props: dict) -> None:
    """Persist table properties (the osmosis_replication_timestamp analog,
    /root/reference/src/utils.rs:4-8) as a tiny parquet sidecar under the
    output dir — scheme-agnostic (no driver-local fs ops), invisible to
    readers of the data dir itself."""
    rows = [(str(k), str(v)) for k, v in sorted(props.items())]
    _write_tiny(
        spark, rows, "key string, value string",
        f"{out_dir}/{PROPS_SUBDIR}", mode="overwrite",
    )


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


def _completed_bucket_list(
    spark: SparkSession, lineage_path: str
) -> list[int] | None:
    """Distinct completed buckets, read DRIVER-SIDE on local paths (the
    lineage table is bounded by bucket count x runs — metadata scale);
    falls back to a Spark distinct+collect on remote URIs."""
    if not _lineage_exists(spark, lineage_path):
        return None
    local = _local_fs_path(lineage_path)
    if local is not None:
        import glob as _glob

        import pyarrow.parquet as pq

        files = sorted(_glob.glob(os.path.join(local, "*.parquet")))
        if not files:
            return None
        seen: set[int] = set()
        for f in files:
            seen.update(
                pq.read_table(f, columns=[BUCKET_COL])
                .column(BUCKET_COL)
                .to_pylist()
            )
        return sorted(seen)
    return sorted(
        r[BUCKET_COL]
        for r in spark.read.parquet(lineage_path)
        .select(BUCKET_COL)
        .distinct()
        .collect()
    )


def completed_buckets(spark: SparkSession, lineage_path: str) -> DataFrame | None:
    rows = _completed_bucket_list(spark, lineage_path)
    if rows is None:
        return None
    return spark.createDataFrame(
        [(int(b),) for b in rows], f"{BUCKET_COL} int"
    )


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

    done_list = _completed_bucket_list(spark, lineage_path)
    done = None
    skipped = 0
    if done_list is not None:
        skipped = len(done_list)
        done = spark.createDataFrame(
            [(int(b),) for b in done_list], f"{BUCKET_COL} int"
        )
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
        # survive joins) so the lineage row can list its data files.
        # Path-glob to THIS run's dirs (basePath recovers the partition
        # cols): lists only the run's directories, and — essential once
        # schema evolution exists — takes the footer schema from this
        # run's files, not from an arbitrary older file whose columns may
        # predate a rename/add.
        landed = (
            spark.read.option("basePath", out_dir)
            .parquet(f"{out_dir}/{BUCKET_COL}=*/{RUN_COL}={run_id}")
            .select("*", F.col("_metadata.file_path").alias("__file"))
            .where(F.col(RUN_COL) == run_id)
        )
    except AnalysisException:  # empty input wrote no files at all (the
        # glob matches nothing -> PATH_NOT_FOUND); any other read failure
        # propagates (round-3 advice: a swallowed transient error silently
        # recorded "nothing written")
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
            # coalesce(1) over the PERSISTED per-bucket aggregate (row
            # count bounded by n_buckets): the aggregate exchange above
            # it keeps the heavy work parallel, and one file per commit
            # keeps the lineage log's file count = commit count (the
            # _tiny_df rationale; this frame is computed, not local, so
            # the parallelize(…, 1) path doesn't apply)
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
        schema_id, spec_id = _register_metadata(
            spark, out_dir, df, cell_col, n_buckets
        )
        snap_id = _append_snapshot(
            spark, out_dir, lineage_path, run_id, written, skipped,
            schema_id, spec_id,
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
SCHEMAS_SUBDIR = "_schemas"
SPECS_SUBDIR = "_specs"


def snapshots(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """The snapshot log (newest last), or None for a never-committed table."""
    try:
        # mergeSchema: snapshot files written before a metadata upgrade
        # (7-column generation) coexist with newer 9-column ones; without
        # the merge, whichever file's footer Spark samples decides whether
        # schema_id/spec_id surface at all.  The log is tiny, so the
        # footer merge costs nothing.
        return (
            spark.read.option("mergeSchema", "true")
            .parquet(f"{out_dir}/{SNAPSHOTS_SUBDIR}")
            .orderBy("snapshot_id")
        )
    except Exception:  # noqa: BLE001 — absent log == no snapshots
        return None


def _snapshot_rows(spark: SparkSession, out_dir: str) -> list | None:
    return _meta_rows(spark, f"{out_dir}/{SNAPSHOTS_SUBDIR}")


def current_snapshot_id(spark: SparkSession, out_dir: str) -> int | None:
    rows = _snapshot_rows(spark, out_dir)
    if not rows:
        return None
    return max(r.snapshot_id for r in rows)


def _append_snapshot(
    spark: SparkSession,
    out_dir: str,
    lineage_path: str,
    run_id: str,
    written: int,
    skipped: int,
    schema_id: int | None = None,
    spec_id: int | None = None,
) -> int:
    parent = current_snapshot_id(spark, out_dir)
    snap_id = (parent or 0) + 1
    # manifest = full lineage state AS OF this commit (cumulative bucket
    # membership — Iceberg's manifest-list role); tiny: one row per bucket
    _copy_manifest(
        spark, lineage_path, f"{out_dir}/{MANIFESTS_SUBDIR}/snap={snap_id}"
    )
    row = [(
        snap_id,
        parent,
        int(time.time() * 1000),
        "append" if skipped else "overwrite",
        run_id,
        written,
        skipped,
        schema_id,
        spec_id,
    )]
    _write_tiny(
        spark,
        row,
        "snapshot_id long, parent_id long, ts long, operation string, "
        "run_id string, buckets_written long, buckets_skipped long, "
        "schema_id long, spec_id long",
        f"{out_dir}/{SNAPSHOTS_SUBDIR}",
    )
    return snap_id


_MANIFEST_COLS = [
    BUCKET_COL, "cell_min", "cell_max", "row_count", "checksum",
    "run_id", "files",
]


def _copy_manifest(
    spark: SparkSession, lineage_path: str, dest: str
) -> None:
    """Snapshot the cumulative lineage state into a manifest dir.

    Driver-side on local paths (same FileIO discipline as ``_write_tiny``
    / ``_meta_rows``): the lineage table is one row per (bucket, run) —
    metadata scale — and a pyarrow read+write of it skips two whole Spark
    jobs (listing read + coalesced write) per commit.  Types are
    preserved exactly because the rows round-trip through arrow from the
    parquet footers Spark wrote.  Remote URIs use the Spark path."""
    local_src = _local_fs_path(lineage_path)
    local_dst = _local_fs_path(dest)
    if local_src is not None and local_dst is not None:
        import glob as _glob
        import shutil
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        files = sorted(_glob.glob(os.path.join(local_src, "*.parquet")))
        tables = [pq.read_table(f, columns=_MANIFEST_COLS) for f in files]
        merged = pa.concat_tables(tables, promote_options="default")
        if os.path.exists(local_dst):
            shutil.rmtree(local_dst)
        os.makedirs(local_dst)
        pq.write_table(
            merged,
            os.path.join(local_dst, f"part-{_uuid.uuid4().hex}.parquet"),
        )
        return
    lin = spark.read.parquet(lineage_path).select(*_MANIFEST_COLS)
    lin.coalesce(1).write.mode("overwrite").parquet(dest)


def read_manifest(spark: SparkSession, out_dir: str, snapshot_id: int) -> DataFrame:
    return spark.read.parquet(
        f"{out_dir}/{MANIFESTS_SUBDIR}/snap={snapshot_id}"
    )


def _pinned_read(
    spark: SparkSession, out_dir: str, pins: DataFrame, merge: bool = False
) -> DataFrame:
    """Data restricted to the (bucket, run) pairs in ``pins`` — partition
    pruning makes this touch only the pinned directories; the run column is
    dropped so reader-facing schema stays stable.  ``merge``: set when the
    table has >1 schema version, so files written under different schemas
    union their columns (otherwise Spark picks one file's footer and a
    post-evolution column may silently vanish)."""
    pairs = pins.select(
        BUCKET_COL, F.col("run_id").alias(RUN_COL)
    ).distinct()
    reader = spark.read
    if merge:
        reader = reader.option("mergeSchema", "true")
    return (
        reader.parquet(out_dir)
        .join(F.broadcast(pairs), [BUCKET_COL, RUN_COL], "left_semi")
        .drop(RUN_COL)
    )


def read_current(spark: SparkSession, out_dir: str, lineage_path: str) -> DataFrame:
    """CURRENT table state: the (bucket, run) pairs the lineage table
    records.  Orphaned files from crashed runs are invisible here.  With a
    schema log the result is projected to the CURRENT schema (renamed
    fields resolve across their physical-name history; columns added since
    a file was written null-fill)."""
    rows = _schema_rows(spark, out_dir)
    df = _pinned_read(
        spark, out_dir, spark.read.parquet(lineage_path),
        merge=_nversions(rows) > 1,
    )
    if not rows:
        return df
    _sid, fields = _current_from(rows)
    return _project_to_schema(df, fields, _cands_from(rows))


def read_as_of(spark: SparkSession, out_dir: str, snapshot_id: int) -> DataFrame:
    """Time-travel read: exactly the (bucket, run) directories committed as
    of ``snapshot_id``.  Committed run dirs are immutable, so this returns
    byte-identical CONTENT even after a later rewrite of the same bucket
    (full Iceberg data-file pinning, not just membership).

    When the table has a schema log, the result is projected to the SCHEMA
    RECORDED AT that snapshot (Iceberg: a snapshot references a schema-id):
    columns added after it vanish, and a field renamed since still comes
    back under its as-of name via field-id resolution."""
    rows = _schema_rows(spark, out_dir)
    df = _pinned_read(
        spark, out_dir, read_manifest(spark, out_dir, snapshot_id),
        merge=_nversions(rows) > 1,
    )
    if not rows:
        return df
    snap = next(
        (
            s
            for s in _snapshot_rows(spark, out_dir) or []
            if s.snapshot_id == snapshot_id
        ),
        None,
    )
    sid = getattr(snap, "schema_id", None)
    if sid is None:  # snapshot predates the schema log
        return df
    fields = sorted((r for r in rows if r.schema_id == sid), key=lambda r: r.ord)
    return _project_to_schema(df, fields, _cands_from(rows))


# --------------------------------------- schema / partition-spec evolution
# Iceberg tracks table schemas and partition specs as versioned metadata:
# every field has a stable field-id; a snapshot references the schema-id and
# spec-id current at commit; readers resolve columns by FIELD-ID, so renames
# are metadata-only and added columns null-fill for files written before
# them.  Without Iceberg jars we keep that model in two tiny parquet logs:
#
#   <out>/_schemas: (schema_id, ord, field_id, name, type, physical)
#     ``physical`` is the column name as it appears in data files written
#     while that schema was current — the field-id -> physical mapping IS
#     the rename history, and reads coalesce a field across all of its
#     physical names (the plain-parquet analog of field-id resolution).
#   <out>/_specs: (spec_id, source, transform, n)
#     Bucket-transform spec; changing the cell column or bucket count at
#     write time appends a new spec (Iceberg partition-spec evolution:
#     applies to NEW data only — old (bucket, run) dirs keep their layout,
#     and reads are unaffected because membership is pinned per snapshot).
#
# Both logs are append-only and driver-readable (a handful of rows).


def _read_meta(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        # mergeSchema for the same mixed-generation reason as snapshots()
        return spark.read.option("mergeSchema", "true").parquet(path)
    except Exception:  # noqa: BLE001 — absent log
        return None


def _meta_rows(spark: SparkSession, path: str) -> list | None:
    """Collected rows of a tiny metadata log, or None when absent.

    Iceberg reads table metadata DRIVER-SIDE (through FileIO), never as
    cluster jobs — a schema/snapshot/spec lookup that launches a Spark job
    pays whole-job scheduling latency to fetch a handful of rows (measured:
    issuing these lookups as jobs doubled snapshot_read).  Local paths read
    through pyarrow on the driver; non-local URIs (s3://, hdfs://) fall
    back to ONE Spark read+collect."""
    local = path[7:] if path.startswith("file://") else path
    if "://" not in local:
        import glob as _glob
        from types import SimpleNamespace

        import pyarrow.parquet as pq

        files = sorted(_glob.glob(os.path.join(local, "*.parquet")))
        if not files:
            return None
        # two-pass manual mergeSchema: older-generation files lack columns
        # newer ones carry; every row gets the UNION of keys (None-filled)
        # so attribute access never depends on which file a row came from
        tables = [pq.read_table(f) for f in files]
        all_keys: list[str] = []
        for t in tables:
            for name in t.column_names:
                if name not in all_keys:
                    all_keys.append(name)
        rows: list = []
        for t in tables:
            rows.extend(
                SimpleNamespace(**{k: d.get(k) for k in all_keys})
                for d in t.to_pylist()
            )
        return rows
    df = _read_meta(spark, path)
    return None if df is None else df.collect()


def schema_log(spark: SparkSession, out_dir: str) -> DataFrame | None:
    return _read_meta(spark, f"{out_dir}/{SCHEMAS_SUBDIR}")


def partition_specs(spark: SparkSession, out_dir: str) -> DataFrame | None:
    return _read_meta(spark, f"{out_dir}/{SPECS_SUBDIR}")


def _schema_rows(spark: SparkSession, out_dir: str) -> list | None:
    return _meta_rows(spark, f"{out_dir}/{SCHEMAS_SUBDIR}")


def _nversions(rows: list | None) -> int:
    return len({r.schema_id for r in rows}) if rows else 0


def _current_from(rows: list) -> tuple[int, list]:
    sid = max(r.schema_id for r in rows)
    fields = sorted((r for r in rows if r.schema_id == sid), key=lambda r: r.ord)
    return sid, fields


def _cands_from(rows: list) -> dict[int, list[str]]:
    """field_id -> physical-name candidates across ALL schema versions
    (the rename history, i.e. plain-parquet field-id resolution)."""
    cands: dict[int, list[str]] = {}
    for r in sorted(rows, key=lambda r: (r.schema_id, r.ord)):
        lst = cands.setdefault(r.field_id, [])
        if r.physical not in lst:
            lst.append(r.physical)
    return cands


def _write_schema(
    spark: SparkSession, out_dir: str, schema_id: int, fields: list[tuple]
) -> None:
    """``fields``: ordered (field_id, name, type, physical) tuples."""
    rows = [(schema_id, i, *f) for i, f in enumerate(fields)]
    _write_tiny(
        spark,
        rows,
        "schema_id long, ord int, field_id long, name string, "
        "type string, physical string",
        f"{out_dir}/{SCHEMAS_SUBDIR}",
    )


def current_schema(
    spark: SparkSession, out_dir: str
) -> tuple[int, list] | None:
    """(schema_id, ordered field rows) of the latest schema, or None."""
    rows = _schema_rows(spark, out_dir)
    return None if not rows else _current_from(rows)


def add_column(spark: SparkSession, out_dir: str, name: str, dtype: str) -> int:
    """Schema evolution: append a column (new field-id).  Metadata-only —
    existing data files are untouched; reads null-fill the column for files
    written before it.  Returns the new schema_id."""
    sid, fields = current_schema(spark, out_dir)
    if any(f.name == name for f in fields):
        raise ValueError(f"column {name!r} already exists")
    nfid = max(f.field_id for f in fields) + 1
    new = [(f.field_id, f.name, f.type, f.physical) for f in fields]
    new.append((nfid, name, dtype, name))
    _write_schema(spark, out_dir, sid + 1, new)
    return sid + 1


def rename_column(spark: SparkSession, out_dir: str, old: str, new: str) -> int:
    """Schema evolution: rename a column KEEPING its field-id (Iceberg
    renames are metadata-only).  Data files written before the rename keep
    the old physical name; reads resolve the field across both.  Returns
    the new schema_id."""
    sid, fields = current_schema(spark, out_dir)
    if not any(f.name == old for f in fields):
        raise ValueError(f"no column {old!r}")
    if any(f.name == new for f in fields):
        raise ValueError(f"column {new!r} already exists")
    nf = [
        (f.field_id, new if f.name == old else f.name, f.type,
         new if f.name == old else f.physical)
        for f in fields
    ]
    _write_schema(spark, out_dir, sid + 1, nf)
    return sid + 1


def _register_metadata(
    spark: SparkSession,
    out_dir: str,
    df: DataFrame,
    cell_col: str,
    n_buckets: int,
) -> tuple[int, int]:
    """Commit-time registration: initialize the schema from the written
    frame on first commit; auto-append a schema version when the write
    carries brand-new columns (Iceberg's accept-any-schema/mergeSchema
    write mode); append a partition spec whenever (source, n) changes.
    Returns (schema_id, spec_id) current for this commit."""
    data_fields = [
        f for f in df.schema.fields if f.name not in (BUCKET_COL, RUN_COL)
    ]
    srows = _schema_rows(spark, out_dir)
    cur = None if not srows else _current_from(srows)
    if cur is None:
        sid = 0
        _write_schema(
            spark, out_dir, sid,
            [(i + 1, f.name, f.dataType.simpleString(), f.name)
             for i, f in enumerate(data_fields)],
        )
    else:
        sid, fields = cur
        known = {f.name for f in fields}
        fresh = [f for f in data_fields if f.name not in known]
        if fresh:
            # a name absent from the CURRENT schema may still live in the
            # rename HISTORY of another field; minting a new field-id for
            # it would leave two logical fields resolving to the same
            # physical column (_cands_from collision) — refuse instead of
            # silently corrupting field-id resolution
            hist = {r.physical for r in srows} | {r.name for r in srows}
            for f in fresh:
                if f.name in hist:
                    raise ValueError(
                        f"column '{f.name}' reuses a renamed column's "
                        "historical name; field-id resolution would become "
                        "ambiguous — pick a fresh name or rename the "
                        "existing field back explicitly"
                    )
            nfid = max(f.field_id for f in fields)
            nf = [(f.field_id, f.name, f.type, f.physical) for f in fields]
            for f in fresh:
                nfid += 1
                nf.append((nfid, f.name, f.dataType.simpleString(), f.name))
            sid += 1
            _write_schema(spark, out_dir, sid, nf)

    rows = _meta_rows(spark, f"{out_dir}/{SPECS_SUBDIR}")
    if rows is None:
        pid = 0
        _write_tiny(
            spark,
            [(pid, cell_col, f"bucket[{n_buckets}]", n_buckets)],
            "spec_id long, source string, transform string, n long",
            f"{out_dir}/{SPECS_SUBDIR}",
        )
    else:
        latest = max(rows, key=lambda r: r.spec_id)
        pid = latest.spec_id
        if (latest.source, latest.n) != (cell_col, n_buckets):
            pid += 1
            _write_tiny(
                spark,
                [(pid, cell_col, f"bucket[{n_buckets}]", n_buckets)],
                "spec_id long, source string, transform string, n long",
                f"{out_dir}/{SPECS_SUBDIR}",
            )
    return sid, pid


def _project_to_schema(df: DataFrame, fields: list, cands: dict) -> DataFrame:
    """Field-id resolution on plain parquet: each schema field maps to the
    data columns that ever carried it (rename history); missing everywhere
    -> typed NULL (file written before the column existed)."""
    cols = []
    for f in fields:
        present = [c for c in cands.get(f.field_id, []) if c in df.columns]
        if not present:
            cols.append(F.lit(None).cast(f.type).alias(f.name))
        elif len(present) == 1:
            cols.append(F.col(present[0]).alias(f.name))
        else:
            cols.append(F.coalesce(*[F.col(c) for c in present]).alias(f.name))
    if BUCKET_COL in df.columns:  # partition column rides along for readers
        cols.append(F.col(BUCKET_COL))
    return df.select(*cols)


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
