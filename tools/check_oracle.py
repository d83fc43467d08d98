"""Driver-simulation: run every queries() entry on Spark AND its oracle_sql()
on DuckDB over the same parquet dir; compare row count, column names, and an
order-insensitive value hash. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "\0"
    if isinstance(v, float):
        if v != v:
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from ot_spark.session import get_spark

    spark = get_spark("oracle_check", parallelism=8)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"{name:>20}: rows={len(srows)} (rows-only, no oracle) {spark_s:.1f}s")
            continue
        # gate-side decimal guard (round-2 sessionize finding): DuckDB
        # HUGEINT/DECIMAL surfaces as decimal128 in Arrow-normalizing
        # harnesses and hash-mismatches Spark's int64 even when fetchall()
        # values compare equal — fail loudly here, not in the driver
        oschema = con.execute(oracles[name]).fetch_arrow_table().schema
        dec = [f"{f.name}:{f.type}" for f in oschema if "decimal" in str(f.type)]
        if dec:
            print(f"{name:>20}: FAIL decimal column(s) in oracle result: {dec}")
            failures.append(name)
            continue
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        ok_rows = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        h_s = table_hash(scols, srows)
        h_o = table_hash(ocols, orows)
        ok_hash = h_s == h_o
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(
            f"{name:>20}: {status} rows {len(srows)}/{len(orows)} "
            f"cols={'ok' if ok_cols else f'{scols} vs {ocols}'} "
            f"hash {'ok' if ok_hash else f'{h_s} vs {h_o}'} {spark_s:.1f}s"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_hash and ok_rows and ok_cols:
                # show a few differing rows for debugging
                sset = {tuple(norm_cell(v) for v in r) for r in srows}
                oset = {tuple(norm_cell(v) for v in r) for r in orows}
                print("  spark-only:", list(sset - oset)[:3])
                print("  oracle-only:", list(oset - sset)[:3])
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
