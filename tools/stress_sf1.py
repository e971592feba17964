"""sf1 stress pass (VERDICT-r7 item 3): run the heaviest gate pipelines
at ~10x the bench SF, capture wall time, result rows, and plan_report.
Compares nothing — the point is catching super-linear blowups and
memory/shuffle cliffs one decade closer to target scale.

Usage: python tools/stress_sf1.py [query ...]"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mallarddv_spark.plans.audit import plan_report  # noqa: E402
from mallarddv_spark.session import get_spark  # noqa: E402
from mallarddv_spark.suite import REGISTRY  # noqa: E402

SF1 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "_stress", "sf1")
DEFAULT = ["dv_flow_lineitem", "adv_neardup_suite", "similarity_suite",
           "text_contamination_suite", "dedup_ngram_jaccard",
           "text_chunking_winnow", "adv_ann_suite"]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark(app_name="stress-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(10).write.format("noop").mode("overwrite").save()
    for name in names:
        fn = REGISTRY[name][0]
        t0 = time.monotonic()
        df = fn(spark, SF1)
        df.write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        n = df.count()
        print(json.dumps({"query": name, "sec": round(dt, 2), "rows": n,
                          "plan": plan_report(df)}), flush=True)


if __name__ == "__main__":
    main()
