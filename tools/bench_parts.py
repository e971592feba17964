"""Per-part timing attribution for the consolidated gate suites: times
each tagged part of a suite independently (the `part` literal filter
folds the other union branches away), min-of-N, at the bench SF.

Usage: python tools/bench_parts.py [suite ...]  (default: the suites
round-7 flagged). Prints a JSON line per suite; paste into NOTES.md."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mallarddv_spark.session import get_spark  # noqa: E402
from mallarddv_spark.suite import REGISTRY  # noqa: E402

PARTS = {
    "text_contamination_suite": ["decontaminate", "bloomdecon", "pii"],
    "similarity_suite": ["topk", "pairs", "qtopk", "pqadc", "ivfpqadc", "margin", "hardneg"],
    "text_chunking_winnow": ["chunk", "winnow", "linededup", "substr", "htmltext"],
    "asof_purchase_click": ["asof", "range", "overlap"],
    "sql_subquery_suite": ["set_ops", "exists", "percentile"],
    "adv_ann_suite": ["lsh", "ivf", "ivfpqstore"],
    "adv_neardup_suite": ["minhash_lsh", "simhash", "embedding_lsh"],
    "dedup_ngram_jaccard": ["jaccard", "contain"],
    "dedup_cluster_assign": ["cluster", "pagerank"],
    "text_frequency_suite": ["vocab", "rarity", "bigramlm", "knlm", "dsir", "nbcls", "bm25", "bm25store", "hybrid", "rrf", "cmfreq", "pplbucket", "evalmetrics"],
    "text_pack_sequences": ["pack", "shards"],
    "text_curation_assign": ["split", "sample", "cap", "order", "srcstats", "unimax", "epochs", "urlnorm", "pareto", "lrscore"],
}


def t(df, runs=2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or list(PARTS)
    spark = get_spark(app_name="mallarddv_spark-bench-parts")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(10).write.format("noop").mode("overwrite").save()
    for name in names:
        fn = REGISTRY[name][0]
        # store-type gate parts do EAGER work (index builds, stored-filter
        # round-trips) at fn() call time — bench.py times it, so report it
        # separately here or per-part deltas stop adding up (see NOTES.md
        # round-8 methodology correction)
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        call_sec = round(time.monotonic() - t0, 3)
        out = {"suite": name, "sf_dir": sf_dir,
               "call_sec": call_sec, "total_sec": t(df)}
        for p in PARTS.get(name, []):
            out[p] = t(fn(spark, sf_dir).filter(f"part = '{p}'"))
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
