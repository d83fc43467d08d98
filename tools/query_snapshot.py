"""Bit-exact query-output snapshots for optimization rounds.

The optimization contract is "same results, faster": every declared query
must produce IDENTICAL rows after a rewrite.  ``check_oracle.py`` compares
against DuckDB at 9 significant digits; this tool is the stricter,
Spark-vs-Spark check — it serializes every cell bit-exactly (doubles via
IEEE-754 bytes), sorts rows, and hashes, so even a 1-ulp drift from a
restructured plan is caught.

Usage:
    python tools/query_snapshot.py save /tmp/snap_sf001 /root/testdata/sf0.001 [q ...]
    python tools/query_snapshot.py diff /tmp/snap_sf001 /root/testdata/sf0.001 [q ...]

``save`` writes one hash file per query; ``diff`` recomputes and compares,
printing PASS/FAIL per query and exiting nonzero on any FAIL.
"""

from __future__ import annotations

import hashlib
import json
import os
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cell(v) -> str:
    if v is None:
        return "\0"
    if isinstance(v, bool):
        return f"b{int(v)}"
    if isinstance(v, float):
        return "f" + struct.pack("<d", v).hex()
    if isinstance(v, bytes):
        return "y" + v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_cell(x)}" for k, x in sorted(v.items())) + "}"
    return "s" + str(v)


def query_hash(df) -> tuple[str, int, list[str]]:
    cols = df.columns
    rows = df.collect()
    lines = sorted("\x01".join(_cell(v) for v in r) for r in rows)
    h = hashlib.sha256()
    h.update("\x01".join(cols).encode())
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest(), len(rows), cols


def main() -> None:
    mode, out_dir, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]

    from ot_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("query_snapshot")
    qs = entrymod.queries()
    if names:
        qs = {n: qs[n] for n in names}
    os.makedirs(out_dir, exist_ok=True)
    failed: list[str] = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            digest, n, cols = query_hash(fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — per-query isolation
            print(f"{name}: ERROR {type(exc).__name__}: {exc}"[:300])
            failed.append(name)
            continue
        path = os.path.join(out_dir, f"{name}.json")
        rec = {"hash": digest, "rows": n, "cols": cols}
        if mode == "save":
            with open(path, "w") as fh:
                json.dump(rec, fh)
            print(f"{name}: saved {n} rows in {time.time() - t0:.1f}s")
        else:
            if not os.path.exists(path):
                print(f"{name}: NO BASELINE")
                failed.append(name)
                continue
            with open(path) as fh:
                want = json.load(fh)
            if want == rec:
                print(f"{name}: PASS ({n} rows, {time.time() - t0:.1f}s)")
            else:
                print(f"{name}: FAIL want={want} got={rec}")
                failed.append(name)
    if failed:
        print(f"FAILED: {sorted(failed)}")
        sys.exit(1)
    print("ALL PASS")


if __name__ == "__main__":
    main()
