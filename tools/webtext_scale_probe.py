"""Webtext operators at 400x gate scale: 2M synthetic documents.

The correctness gate runs at 500-5000 documents; this probe demonstrates
the same operators at 2,000,000 documents on local[32] — JVM-only
generation (no Python row functions), fixed vocabulary word-salad with
planted exact duplicates (0.5%) so the dedup paths do real work.

Writes BENCH/WEBTEXT_SCALE.json: docs/sec per operator, min-of-2.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from ot_spark.session import get_spark  # noqa: E402

N_DOCS = int(os.environ.get("SPARK_GRAFT_WEBTEXT_DOCS", "2000000"))
VOCAB = [
    "the", "and", "for", "with", "data", "spark", "query", "table", "row",
    "join", "merge", "sort", "filter", "agg", "window", "batch", "stream",
    "hash", "key", "value", "fast", "slow", "big", "small", "line", "part",
    "order", "group", "scan", "column", "vector", "dup", "a", "is", "to",
    "of", "in", "it", "that", "customer",
]


def docs_df(spark):
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    base = spark.range(0, N_DOCS, 1, 64).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 20).cast("string")).alias("source"),
    )
    # planted exact duplicates: ids = 0 mod 200 copy the text of id+1
    eff = F.when(F.col("doc_id") % 200 == 0, F.col("doc_id") + 1).otherwise(
        F.col("doc_id")
    )
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), (F.lit(20) + eff % 80).cast("int")),
            lambda i: F.element_at(
                vocab, (F.pmod(F.hash(eff, i), F.lit(len(VOCAB))) + 1).cast("int")
            ),
        ),
        " ",
    )
    return base.withColumn("text", text)


def main() -> None:
    spark = get_spark("webtext_scale", parallelism=32, shuffle_partitions=64)
    path = f"/tmp/webtext_scale_{N_DOCS}.parquet"
    if not os.path.exists(path):
        docs_df(spark).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)

    from ot_spark.webtext.crawldiff import (
        CRAWL_EPOCH, DAY, crawl_delta, latest_snapshot, synthetic_revisions,
    )
    from ot_spark.webtext.curate import corpus_clean, pack_bins, stratified_sample
    from ot_spark.webtext.dedup import with_minhash
    from ot_spark.webtext.textstats import with_repetition_full
    from ot_spark.webtext.warc import parse_warc_records, synthetic_warc_blob

    def run(df):
        # count() lets Catalyst prune every computed column to nothing;
        # the noop sink materializes ALL output columns (real work)
        df.write.format("noop").mode("overwrite").save()
        return None

    ops = {
        "corpus_clean": lambda: run(corpus_clean(docs)),
        "minhash_signatures": lambda: run(with_minhash(docs)),
        "repetition_full": lambda: run(with_repetition_full(docs)),
        "pack_bins": lambda: run(pack_bins(docs)),
        "stratified_sample": lambda: run(stratified_sample(docs, 1000)),
        # r6: crawl-log primitives at ~4M revision rows over 2M keys
        "crawl_asof": lambda: run(
            latest_snapshot(synthetic_revisions(docs), CRAWL_EPOCH + 6 * DAY)
        ),
        "crawl_delta": lambda: run(
            crawl_delta(
                synthetic_revisions(docs),
                CRAWL_EPOCH + 4 * DAY, CRAWL_EPOCH + 12 * DAY,
            )
        ),
        # r6: WARC framing walk over 2M blobs (~4M records)
        "warc_parse": lambda: run(
            parse_warc_records(
                docs.select(
                    "doc_id", synthetic_warc_blob(F.col("doc_id")).alias("warc")
                )
            )
        ),
    }

    # r6b additions: sketches, index build, corpus stats, graph ops
    from ot_spark.graph import hits_fixed, synthetic_edges, triangles
    from ot_spark.webtext.invindex import inverted_index, pmi_pairs
    from ot_spark.webtext.sketch import bloom_build, cms_build
    from ot_spark.webtext.textstats import exact_percentiles

    nodes = docs.select(F.col("doc_id").alias("node"))
    lens = docs.select("source", F.length("text").cast("long").alias("len"))
    ops.update({
        "bloom_build": lambda: run(bloom_build(docs, ["source"], "text")),
        "cms_build": lambda: run(cms_build(docs, "text")),
        "inverted_index": lambda: run(inverted_index(docs)),
        "host_percentiles": lambda: run(
            exact_percentiles(lens, ["source"], "len")
        ),
        # pair generation is CPU-bound map-side (vocab-bounded, 780
        # distinct pairs); the exchange carries only the partial aggs
        "pmi_pairs": lambda: run(pmi_pairs(docs, min_pair_count=2)),
        # link-graph ops over 2M nodes / ~4M deterministic edges
        "triangles": lambda: run(triangles(synthetic_edges(docs, N_DOCS))),
        "hits_2iter": lambda: run(
            hits_fixed(synthetic_edges(docs, N_DOCS), nodes, iters=2)
        ),
    })

    # r6c additions: communities/cores/ppr/co-citation, index compression,
    # scheduling, bursts, layout, WARC sink
    from ot_spark.cells import zorder_layout
    from ot_spark.graph import cocitation, kcore, label_prop, ppr_fixed
    from ot_spark.webtext.crawldiff import burst_hosts, synthetic_revisions
    from ot_spark.webtext.invindex import delta_postings
    from ot_spark.webtext.urltools import fetch_schedule
    from ot_spark.webtext.warc import (
        parse_warc_records as _pwr, synthetic_warc_blob as _swb,
        write_warc_records,
    )

    seeds = docs.where(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("node")
    )
    frontier = docs.select(
        F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("url"),
        "source",
        (F.col("doc_id") % 100).cast("long").alias("priority"),
        (1 + F.col("doc_id") % 3).cast("long").alias("rate"),
    )
    grid = docs.select(
        "doc_id",
        (F.col("doc_id") % 360).cast("long").alias("xi"),
        (F.col("doc_id") % 180).cast("long").alias("yi"),
    )
    ops.update({
        "label_prop_3iter": lambda: run(
            label_prop(synthetic_edges(docs, N_DOCS), nodes, iters=3)
        ),
        "kcore_3round": lambda: run(
            kcore(synthetic_edges(docs, N_DOCS), k=3, rounds=3)
        ),
        "ppr_3iter": lambda: run(
            ppr_fixed(synthetic_edges(docs, N_DOCS), nodes, seeds, iters=3)
        ),
        "cocitation": lambda: run(
            cocitation(
                synthetic_edges(docs, N_DOCS).select(
                    "src", (F.col("dst") % 50).alias("dst")
                ),
                cap=20,
            )
        ),
        "delta_postings": lambda: run(delta_postings(docs)),
        "fetch_schedule": lambda: run(
            fetch_schedule(frontier, host="source")
        ),
        "burst_hosts": lambda: run(
            burst_hosts(synthetic_revisions(docs), F.col("doc_id") % 50)
        ),
        "zorder_layout": lambda: run(
            zorder_layout(grid, F.col("xi"), F.col("yi"), bits=9)
        ),
        "warc_write": lambda: run(
            write_warc_records(
                _pwr(docs.select(
                    "doc_id", _swb(F.col("doc_id")).alias("warc")
                ))
            )
        ),
    })

    # r7 (VERDICT r6 #4): production-depth iterative graph ops — depth 10
    # on the same 2M-node / ~4M-edge graph, with the final plan's Exchange
    # count recorded so growth across depth is auditable (flat per round,
    # not exponential: lineage truncation caps the unrolled plan).
    from ot_spark.graph import pagerank_fixed

    def _exchanges(df) -> int:
        s = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        return s.count("Exchange")

    depth_evidence = {}

    def _depth(name, builder, iters):
        def go():
            df = builder(iters)
            depth_evidence[name] = {
                "iters": iters, "exchanges_in_final_plan": _exchanges(df)
            }
            run(df)
        return go

    ops.update({
        "pagerank_10iter": _depth(
            "pagerank_10iter",
            lambda k: pagerank_fixed(
                synthetic_edges(docs, N_DOCS), nodes, N_DOCS, iters=k
            ),
            10,
        ),
        "label_prop_10iter": _depth(
            "label_prop_10iter",
            lambda k: label_prop(synthetic_edges(docs, N_DOCS), nodes, iters=k),
            10,
        ),
        "kcore_10round": _depth(
            "kcore_10round",
            lambda k: kcore(synthetic_edges(docs, N_DOCS), k=3, rounds=k),
            10,
        ),
    })

    only = os.environ.get("SPARK_GRAFT_WEBTEXT_OPS")
    if only:
        keep = {k.strip() for k in only.split(",")}
        ops = {k: v for k, v in ops.items() if k in keep}

    out_path = os.path.join(REPO, "BENCH", "WEBTEXT_SCALE.json")
    out = {"n_docs": N_DOCS, "cpus": 32, "ops": {}}
    if os.path.exists(out_path):
        try:
            prev = json.load(open(out_path))
            if prev.get("n_docs") == N_DOCS:
                out["ops"].update(prev.get("ops", {}))
        except Exception:
            pass
    for name, fn in ops.items():
        times = []
        for _ in range(2):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        sec = min(times)
        out["ops"][name] = {
            "sec": round(sec, 2),
            "docs_per_sec": round(N_DOCS / sec, 1),
            }
        if name in depth_evidence:
            out["ops"][name].update(depth_evidence[name])
        print(name, out["ops"][name], flush=True)
    with open(os.path.join(REPO, "BENCH", "WEBTEXT_SCALE.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
