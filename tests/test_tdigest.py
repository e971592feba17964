"""Merging t-digest (functions/tdigest): accuracy against exact
quantiles on heavy-tailed data, content-determinism across partition
layouts, weighted-equals-replicated builds, merge/append/persistence
contracts.

Reference scope note: no sketch tier exists in the reference engine —
this completes the portable-sketch family's quantile matrix
(row-weighted + unbounded range).
"""

import numpy as np
import pytest

from mallarddv_spark.exceptions import DVConfigurationError
from mallarddv_spark.functions.tdigest import (
    load_tdigest,
    save_tdigest,
    tdigest_append,
    tdigest_build,
    tdigest_merge,
    tdigest_quantiles,
)

PROBS = [0.001, 0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999]


def _values():
    # bimodal + heavy tail: the shape a declared-range histogram cannot
    # serve (no knowable [lo, hi))
    rng = np.random.default_rng(7)
    return np.concatenate(
        [rng.lognormal(0, 1, 20000), rng.normal(100, 5, 5000)]
    )


@pytest.fixture(scope="module")
def vals():
    return _values()


@pytest.fixture(scope="module")
def df(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "x double")


@pytest.fixture(scope="module")
def digest(df):
    return tdigest_build(df, "x", delta=200)


def _q_errors(vals, cents, params):
    est = {r.p: r.est for r in tdigest_quantiles(cents, params, PROBS).collect()}
    return {p: abs(float((vals <= est[p]).mean()) - p) for p in PROBS}, est


def test_accuracy_q_space(vals, digest):
    """Rank error ≤ 0.2% at the tails (where k1 concentrates centroids)
    and ≤ 0.5% mid-stream, at delta=200 on 25k bimodal values."""
    errs, est = _q_errors(vals, *digest)
    for p in (0.001, 0.01, 0.99, 0.999):
        assert errs[p] <= 0.002, (p, errs[p])
    for p in (0.25, 0.5, 0.75, 0.9):
        assert errs[p] <= 0.005, (p, errs[p])
    # estimates are monotone in p and clamped to the exact extremes
    ordered = [est[p] for p in PROBS]
    assert ordered == sorted(ordered)
    assert digest[1]["min"] <= ordered[0] <= ordered[-1] <= digest[1]["max"]


def test_state_bounded_and_exact_stats(vals, digest):
    cents, params = digest
    rows = cents.collect()
    assert len(rows) <= 2 * params["delta"]
    assert params["total"] == float(len(vals))
    assert params["min"] == float(vals.min())
    assert params["max"] == float(vals.max())
    assert sum(r.weight for r in rows) == pytest.approx(len(vals), abs=1e-6)


def test_content_deterministic_across_layouts(df, digest):
    want = sorted((r.mean, r.weight) for r in digest[0].collect())
    for n in (1, 7, 32):
        got = tdigest_build(df.repartition(n), "x", delta=200)[0].collect()
        assert sorted((r.mean, r.weight) for r in got) == want


def test_weighted_equals_replicated(spark):
    """(value, weight=k) builds the identical digest to k copies of the
    row — the groupBy(value) stage makes them the same table."""
    rng = np.random.default_rng(11)
    pairs = [(float(v), int(k)) for v, k in
             zip(rng.normal(0, 1, 500), rng.integers(1, 6, 500))]
    weighted = spark.createDataFrame(pairs, "x double, k int")
    flat = spark.createDataFrame(
        [(v,) for v, k in pairs for _ in range(k)], "x double"
    )
    cw, pw = tdigest_build(weighted, "x", weight_col="k", delta=100)
    cf, pf = tdigest_build(flat, "x", delta=100)
    assert sorted((r.mean, r.weight) for r in cw.collect()) == \
           sorted((r.mean, r.weight) for r in cf.collect())
    assert pw == pf


def test_merge_halves_close_to_whole(spark, vals, df, digest):
    lo = df.filter("x < 2")
    hi = df.filter("x >= 2")
    merged = tdigest_merge([
        tdigest_build(lo, "x", delta=200),
        tdigest_build(hi, "x", delta=200),
    ])
    assert merged[1]["total"] == digest[1]["total"]
    assert merged[1]["min"] == digest[1]["min"]
    assert merged[1]["max"] == digest[1]["max"]
    errs, _ = _q_errors(vals, *merged)
    assert max(errs.values()) <= 0.005


def test_save_load_append(spark, df, vals, tmp_path):
    path = str(tmp_path / "td")
    half_n = len(vals) // 2
    first = df.limit(half_n)
    rest = spark.createDataFrame(
        [(float(v),) for v in vals[half_n:]], "x double"
    )
    save_tdigest(*tdigest_build(first, "x", delta=200), path=path)
    tdigest_append(rest, path, "x")
    cents, params = load_tdigest(spark, path)
    assert params["total"] == float(len(vals))
    assert params["delta"] == 200
    errs, _ = _q_errors(vals, cents, params)
    assert max(errs.values()) <= 0.005
    # second save over a live copy exercises the staged-rename path
    save_tdigest(cents, params, path)
    again = load_tdigest(spark, path)
    assert again[1] == params


def test_null_nan_and_nonpositive_weight_filtered(spark):
    rows = [(1.0, 1.0), (2.0, 1.0), (None, 1.0),
            (float("nan"), 1.0), (3.0, 0.0), (4.0, -2.0)]
    df = spark.createDataFrame(rows, "x double, w double")
    cents, params = tdigest_build(df, "x", weight_col="w", delta=50)
    assert params["total"] == 2.0
    assert params["min"] == 1.0 and params["max"] == 2.0


def test_empty_input_and_guards(spark):
    empty = spark.createDataFrame([], "x double")
    cents, params = tdigest_build(empty, "x")
    assert params["total"] == 0.0 and params["min"] is None
    assert tdigest_quantiles(cents, params, [0.5]).count() == 0
    with pytest.raises(DVConfigurationError, match="delta"):
        tdigest_build(empty, "x", delta=5)
    with pytest.raises(DVConfigurationError, match="probs"):
        tdigest_quantiles(
            *tdigest_build(
                spark.createDataFrame([(1.0,)], "x double"), "x"
            ), probs=[1.5],
        )
    with pytest.raises(DVConfigurationError, match="at least one"):
        tdigest_merge([])


def test_plan_no_python(df):
    from mallarddv_spark.plans.audit import plan_report

    cents, _ = tdigest_build(df, "x", delta=100)
    assert plan_report(cents)["python_stages"] == 0
