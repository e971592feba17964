"""Capture `.explain("formatted")` for every declared query into
plans/<tag>/<query>_<suffix>.txt (round-14 deliverable: the judge checks
plan claims against these files).

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]
e.g.   python tools/capture_plans.py r14 before
       python tools/capture_plans.py r14 after text_frequency_suite

Queries with side effects at fn() call time (stored-index builds, the
streaming gate) still produce a plan for their *returned* DataFrame —
that is what the bench materializes.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mallarddv_spark.session import get_spark  # noqa: E402
from mallarddv_spark.suite import REGISTRY  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or list(REGISTRY)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="mallarddv_spark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = REGISTRY[name][0]
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {ex}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", flush=True)


if __name__ == "__main__":
    main()
