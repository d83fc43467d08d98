"""Physical-plan audit: per gate query, count exchanges / joins / Arrow
nodes and check scan pushdown — the 100-TB smell test.

Interpretation guide (what we require of the plans):
- spatial joins (pip_admin, elevation, knn_raster): broadcast only —
  `Exchange` hits must all be BroadcastExchange, zero shuffles;
- semi joins: broadcast semi after a distinct on the (small) build side;
- salted_cells: exactly two hash-aggregate stages (keys+salt, then keys);
- every Python boundary is Arrow-batched (ArrowEvalPython / MapInPandas);
  row-at-a-time BatchEvalPython anywhere is a bug.

    python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from ot_spark.session import get_spark

    spark = get_spark("plan_audit", parallelism=8)
    bad = []
    for name, fn in e.queries().items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
        row_python = plan.count("BatchEvalPython")
        print(
            f"{name:>20}: shuffle_exchanges={shuffles} "
            f"broadcast={plan.count('BroadcastExchange')} "
            f"bhj={plan.count('BroadcastHashJoin')} "
            f"smj={plan.count('SortMergeJoin')} "
            f"arrow={plan.count('ArrowEvalPython') + plan.count('MapInPandas')} "
            f"row_python={row_python}"
        )
        if row_python:
            bad.append((name, "row-at-a-time Python UDF in plan"))
    for name, why in bad:
        print(f"FAIL {name}: {why}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
