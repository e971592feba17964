"""Gopher repetition battery (operators/textops.repetition_profile):
pinned examples + pure-Python differential on real corpus docs, plan
pinned shuffle-free."""

import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pytest

from mallarddv_spark.exceptions import DVConfigurationError
from mallarddv_spark.operators.textops import (
    GOPHER_REPETITION_RULES,
    repetition_filter,
    repetition_profile,
)

SF = "/root/testdata/sf0.001"


def _r6(x: float) -> float:
    """Spark's round() is HALF_UP; Python's is banker's — match Spark."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           rounding=ROUND_HALF_UP))


def _py_signals(text, top_ns=(2, 3, 4), dup_ns=(5, 6, 7, 8, 9, 10)):
    """Reference implementation: count x length, capped at 1."""
    t = text.strip()
    chars = max(len(t), 1)
    toks = re.split(r"\s+", t) if t else [""]
    lines = t.split("\n")
    out = {}
    c = Counter(lines)
    out["rep_dup_line_frac"] = _r6(
        (len(lines) - len(set(lines))) / max(len(lines), 1)
    )
    out["rep_dup_line_char_frac"] = _r6(
        min(sum(n * len(l) for l, n in c.items() if n >= 2) / chars, 1.0)
    )
    for n in top_ns:
        grams = Counter(
            " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
        ) if len(toks) >= n else Counter()
        top = 0
        if grams:
            # most frequent; lexicographically FIRST gram on count ties
            bestn = max(grams.values())
            gram = min(g for g, cnt in grams.items() if cnt == bestn)
            top = bestn * len(gram)
        out[f"rep_top_{n}gram_char_frac"] = _r6(min(top / chars, 1.0))
    for n in dup_ns:
        grams = Counter(
            " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
        ) if len(toks) >= n else Counter()
        dup = sum(cnt * len(g) for g, cnt in grams.items() if cnt >= 2)
        out[f"rep_dup_{n}gram_char_frac"] = _r6(min(dup / chars, 1.0))
    return out


def test_pinned_examples(spark):
    from pyspark.sql import Row

    docs = spark.createDataFrame([
        Row(doc_id=0, text="the cat sat on the mat"),
        Row(doc_id=1, text="spam spam spam spam spam spam spam spam"),
        Row(doc_id=2, text="line one\nline one\nline two\nline one"),
        Row(doc_id=3, text=""),
    ])
    got = {r.doc_id: r.asDict() for r in
           repetition_profile(docs, "doc_id", "text").collect()}
    # "the cat" (7 chars, count 1) over 22 chars
    assert got[0]["rep_top_2gram_char_frac"] == round(7 / 22, 6)
    assert got[0]["rep_dup_line_frac"] == 0.0
    # all-overlap pathological doc caps at 1
    assert got[1]["rep_top_2gram_char_frac"] == 1.0
    assert got[1]["rep_dup_5gram_char_frac"] == 1.0
    # 4 lines, 2 distinct -> 2 duplicated slots; 3 copies of "line one"
    assert got[2]["rep_dup_line_frac"] == 0.5
    assert got[2]["rep_dup_line_char_frac"] == round(3 * 8 / 35, 6)
    # empty doc: all zeros
    assert all(v == 0.0 for k, v in got[3].items() if k != "doc_id")


def test_differential_vs_python_reference(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    rows = {r.doc_id: r.text for r in docs.collect()}
    got = {r.doc_id: r.asDict() for r in
           repetition_profile(docs, "doc_id", "text").collect()}
    assert set(got) == set(rows)
    for doc_id, text in rows.items():
        exp = _py_signals(text)
        for k, v in exp.items():
            assert abs(got[doc_id][k] - v) < 1e-9, (doc_id, k, got[doc_id][k], v)


def test_filter_rules_and_plan(spark):
    from mallarddv_spark.plans.audit import assert_plan

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = repetition_filter(docs, "doc_id", "text")
    rep = assert_plan(out, no_python_stages=True, no_nested_loop_joins=True,
                      max_shuffles=0)
    assert rep["generates"] == 0  # no explode — pure projection
    rows = out.select("rep_keep").groupBy("rep_keep").count().collect()
    assert sum(r["count"] for r in rows) == docs.count()
    # unknown rule name rejected
    with pytest.raises(DVConfigurationError, match="unknown repetition"):
        repetition_filter(docs, "doc_id", "text", rules={"nope": 0.5})
    # disabling every rule keeps everything
    allow_all = {k: None for k in GOPHER_REPETITION_RULES}
    kept = repetition_filter(docs, "doc_id", "text", rules=allow_all)
    assert kept.filter("NOT rep_keep").count() == 0
