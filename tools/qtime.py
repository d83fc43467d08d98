"""Time individual queries with the noop sink, and/or dump their plans.

Measurement methodology matches bench.py (run query fn -> noop write), with
N repeats so JIT/planning warmup is visible.  Used for before/after evidence
in optimization rounds; the tree under test is chosen by PYTHONPATH (point
it at a git worktree of the old commit for "before").

Usage:
    python tools/qtime.py SF_DIR REPEATS query [query ...]
    PLAN_OUT=/path/dir python tools/qtime.py SF_DIR 0 query ...   # plans only
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, repeats = sys.argv[1], int(sys.argv[2])
    names = sys.argv[3:]

    from ot_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("qtime")
    os.environ.setdefault("SPARK_GRAFT_WRITE_QUERY_CAP", "100000")
    qs = entrymod.queries()
    plan_out = os.environ.get("PLAN_OUT")
    for name in names:
        fn = qs[name]
        if plan_out:
            df = fn(spark, sf_dir)
            os.makedirs(plan_out, exist_ok=True)
            with open(os.path.join(plan_out, f"{name}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print(f"{name}: plan written")
        times = []
        for _ in range(repeats):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        if times:
            print(f"{name}: min={min(times)} runs={times}")


if __name__ == "__main__":
    main()
