"""Per-part failure localization for the consolidated gate suites.

The driver's correctness gate hashes a whole suite result — so a
multi-part suite (e.g. `text_frequency_suite`, 11 parts) failing tells
you *a* part diverged, not which. This tool replays each tagged part
independently: Spark result filtered to `part = '<p>'` vs the DuckDB
oracle wrapped in the same filter, compared with the gate's own
canonicalization (sorted columns, order-insensitive rows). Run it on a
red suite and it names the diverging part(s) plus a sample of the
first differing canonical rows.

Usage:
    python tools/localize_part.py [suite ...]          # default: all multi-part suites
    SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 python tools/localize_part.py text_frequency_suite
"""

from __future__ import annotations

import math
import os
import sys


def canon(value):
    if value is None:
        return "NULL"
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return repr(value)
    if isinstance(value, bool):
        return str(bool(value))
    if hasattr(value, "isoformat"):
        return value.isoformat(sep=" ") if hasattr(value, "hour") else value.isoformat()
    return str(value)


def rows_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main(argv: list[str]) -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import duckdb

    from mallarddv_spark import get_spark
    from mallarddv_spark.suite import REGISTRY

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
    spark = get_spark(app_name="mallarddv_spark-localize-part")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    names = argv or [
        n for n, (fn, sql) in REGISTRY.items()
        if sql is not None and "AS part" in sql
    ]
    bad = 0
    for name in names:
        if name not in REGISTRY:
            print(f"{name}: not in REGISTRY"); bad += 1
            continue
        fn, sql = REGISTRY[name]
        if sql is None:
            print(f"{name}: rows-only gate (no oracle) — nothing to localize")
            continue
        df = fn(spark, sf_dir)
        if "part" not in df.columns:
            print(f"{name}: single-part query — run tests/test_suite_oracle.py instead")
            continue
        parts = sorted(r.part for r in df.select("part").distinct().collect())
        print(f"{name} ({len(parts)} parts @ {sf_dir}):")
        for p in parts:
            s_rows = df.filter(df.part == p).collect()
            got = rows_canon(df.columns, s_rows)
            rel = con.sql(f"SELECT * FROM ({sql}) __all WHERE part = '{p}'")
            want = rows_canon(list(rel.columns), rel.fetchall())
            if got == want:
                print(f"  part {p!r}: OK ({len(got)} rows)")
            else:
                bad += 1
                print(f"  part {p!r}: MISMATCH spark={len(got)} oracle={len(want)}")
                for g, w in zip(got, want):
                    if g != w:
                        print(f"    first diff:\n      spark : {g}\n      oracle: {w}")
                        break
                else:
                    longer, label = (got, "spark") if len(got) > len(want) else (want, "oracle")
                    if longer:
                        print(f"    extra {label} row: {longer[min(len(got), len(want))]}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
