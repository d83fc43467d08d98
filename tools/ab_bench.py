"""Interleaved A/B bench: a pinned git commit (build A) vs the current tree
(build B), alternated A,B,B,A in one sitting on the same host.

Protocol (VERDICT r3 "Next #1"): every bench query in r3 was slower than r2
(median 1.30x) with zero interleaved evidence to separate host noise from
code regressions.  This tool provides that evidence:

- build A is checked out into a throwaway git worktree; build B is the
  current repo tree (including uncommitted changes);
- each measurement is a fresh subprocess JVM, so no build warms the other's
  JIT, and the A,B,B,A order cancels slow drift (page cache, noisy
  neighbors) to first order;
- both builds scan the SAME materialized flagship input (generated once,
  passed via SPARK_GRAFT_BENCH_INPUT — r2 and HEAD share GEN_VERSION=1)
  and the same sf testdata;
- per-query warm timing: each query runs twice per measurement, min kept.

Output: one JSON with per-query times for every measurement plus the
per-build min and the B/A ratio.  Ratio ~1.0 => the r2->r3 drift was host
noise; ratio >> 1.0 on a query => real code regression.

Usage:
    python tools/ab_bench.py [--commit 84b8744] [--queries q1,q2,...]
                             [--out BENCH/AB_r04.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, sys, time

repo = sys.argv[1]
out_path = sys.argv[2]
query_names = [q for q in sys.argv[3].split(",") if q]
sf_dir = sys.argv[4]
run_flagship = sys.argv[5] == "1"

sys.path.insert(0, repo)
os.chdir(repo)

from ot_spark.session import get_spark

spark = get_spark("ab_bench", parallelism=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

import __spark_entry__ as entrymod

res = {"queries": {}}
qs = entrymod.queries()
for name in query_names:
    if name not in qs:
        res["queries"][name] = None
        continue
    times = []
    for _ in range(2):  # warm protocol: run twice, keep both, min wins
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 3))
    res["queries"][name] = times

if run_flagship:
    import bench
    sec, n, all_runs = bench.run_pipeline(spark, bench.BENCH_PAGES)
    res["flagship"] = {"sec": round(sec, 3), "pages": n,
                       "pages_per_sec": round(n / sec, 1), "runs": all_runs}

with open(out_path, "w") as f:
    json.dump(res, f)
spark.stop()
"""


def measure(build_root: str, label: str, queries: list[str], sf_dir: str,
            input_path: str, flagship: bool) -> dict:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as rf:
        rf.write(RUNNER)
        runner = rf.name
    out_json = tempfile.mktemp(suffix=".json")
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_INPUT"] = input_path
    env.setdefault("SPARK_GRAFT_BENCH_WARMUP", "5")
    env.setdefault("SPARK_GRAFT_BENCH_RUNS", "4")
    subprocess.run(
        [sys.executable, runner, build_root, out_json, ",".join(queries),
         sf_dir, "1" if flagship else "0"],
        check=True, env=env,
    )
    with open(out_json) as f:
        got = json.load(f)
    got["build"] = label
    os.unlink(runner)
    os.unlink(out_json)
    return got


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commit", default="84b8744", help="build A commit")
    ap.add_argument("--queries", default="simhash_pairs,minmax_ids,lineage_resume,ngram_jaccard")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "AB_r04.json"))
    ap.add_argument("--no-flagship", action="store_true")
    args = ap.parse_args()
    queries = [q for q in args.queries.split(",") if q]

    wt = f"/tmp/ab_worktree_{args.commit}"
    if not os.path.exists(wt):
        subprocess.run(["git", "worktree", "add", "--detach", wt, args.commit],
                       cwd=REPO, check=True)

    # materialize the shared flagship input once (both builds GEN_VERSION=1)
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "8000000"))
    input_path = f"/tmp/bench_pages_v1_{n_pages}.parquet"
    if not os.path.exists(input_path):
        subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, sys.argv[1]);"
             "from ot_spark.session import get_spark;"
             "from ot_spark.benchdata import pages_range_df;"
             "s = get_spark('gen', parallelism=32);"
             f"pages_range_df(s, {n_pages}, partitions=128)"
             f".write.mode('overwrite').parquet('{input_path}')",
             REPO],
            check=True,
        )

    flagship = not args.no_flagship
    order = [("A", wt), ("B", REPO), ("B", REPO), ("A", wt)]
    runs = []
    for label, root in order:
        print(f"=== measuring build {label} ({root}) ===", flush=True)
        runs.append(measure(root, label, queries, args.sf_dir, input_path, flagship))

    def best(label: str, name: str) -> float | None:
        vals = []
        for r in runs:
            if r["build"] != label:
                continue
            if name == "flagship":
                if "flagship" in r:
                    vals.append(r["flagship"]["sec"])
            else:
                t = r["queries"].get(name)
                if t:
                    vals.append(min(t))
        return min(vals) if vals else None

    summary = {}
    for name in queries + (["flagship"] if flagship else []):
        a, b = best("A", name), best("B", name)
        summary[name] = {
            "A_sec": a, "B_sec": b,
            "B_over_A": round(b / a, 3) if a and b else None,
        }
    result = {
        "protocol": "interleaved A,B,B,A; fresh JVM per measurement; shared "
                    "materialized input; per-query run-twice-min; flagship "
                    "warmup=%s runs=%s" % (
                        os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "5"),
                        os.environ.get("SPARK_GRAFT_BENCH_RUNS", "4")),
        "build_A": args.commit,
        "build_B": "current tree",
        "summary": summary,
        "measurements": runs,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
