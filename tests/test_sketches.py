"""Mergeable HyperLogLog (functions/sketches): accuracy bands, lossless
merge, grouped sketches, linear-counting branch, DuckDB byte-parity of
the md5 mode, and the persisted append/heal lifecycle."""

import duckdb
import pytest
from pyspark.sql import functions as F

from mallarddv_spark.exceptions import DVConfigurationError
from mallarddv_spark.functions import sketches as sk

M = 4096  # p=12
Q2_48, Q2_49 = 2 ** 48, 2 ** 49


def _vals(spark, n, prefix="v", start=0):
    return spark.range(start, start + n).select(
        F.concat(F.lit(prefix), F.col("id")).alias("v")
    )


def test_estimate_within_error_band(spark):
    """p=12 → rsd ≈ 1.04/sqrt(4096) ≈ 1.6%; both hash modes must land
    within a generous 3-sigma band at 100k distincts."""
    df = _vals(spark, 100_000)
    for mode in ("xxhash64", "md5"):
        est = sk.hll_estimate(
            sk.hll_registers(df, "v", p=12, hash_mode=mode), p=12
        ).first()
        assert abs(est.est_distinct - 100_000) / 100_000 < 0.05, (
            mode, est.est_distinct)


def test_merge_is_lossless(spark):
    """Merging sketches of two OVERLAPPING halves must equal the
    one-shot sketch over the union — the property that makes per-batch
    appends and per-shard sketches composable."""
    df = _vals(spark, 50_000)
    h1 = sk.hll_registers(df.filter("substr(v, 2) < '3'"), "v", p=12,
                          hash_mode="md5")
    h2 = sk.hll_registers(df.filter("substr(v, 2) >= '2'"), "v", p=12,
                          hash_mode="md5")
    merged = sorted(map(tuple, sk.hll_merge(h1, h2).collect()))
    one = sorted(map(tuple, sk.hll_registers(df, "v", p=12,
                                             hash_mode="md5").collect()))
    assert merged == one


def test_grouped_and_duplicates_and_nulls(spark):
    """Per-group sketches; duplicate values count once; NULLs ignored."""
    df = spark.range(30_000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.concat(F.lit("x"), (F.col("id") % 9000)).alias("v"),
    ).unionByName(
        spark.createDataFrame([("0", None)], "g string, v string")
    )
    regs = sk.hll_registers(df, "v", p=12, by=["g"], hash_mode="md5")
    ests = {r.g: r.est_distinct
            for r in sk.hll_estimate(regs, p=12, by=["g"]).collect()}
    # each group sees 3000 distinct values (9000 spread over 3 groups)
    for g in ("0", "1", "2"):
        assert abs(ests[g] - 3000) / 3000 < 0.06, (g, ests[g])


def test_linear_counting_small_range(spark):
    """Tiny cardinalities take the linear-counting branch and stay
    near-exact."""
    est = sk.hll_estimate(
        sk.hll_registers(_vals(spark, 50, "s"), "v", p=12), p=12
    ).first()
    assert abs(est.est_distinct - 50) < 5


def test_md5_mode_replays_in_duckdb(spark, tmp_path):
    """The md5-mode registers AND the rounded estimate must match a
    closed-form DuckDB replay byte-for-byte — the oracle contract the
    sql_approx_aggregates gate columns rely on."""
    pq = str(tmp_path / "vals.parquet")
    _vals(spark, 20_000).write.parquet(pq)
    df = spark.read.parquet(pq)
    got = sk.hll_estimate(
        sk.hll_registers(df, "v", p=12, hash_mode="md5"), p=12
    ).first()
    alpha = 0.7213 / (1.0 + 1.079 / M)
    raw = (
        f"({alpha!r} * cast({M} as double) * cast({M} as double)"
        f" * cast({Q2_49} as double)"
        f" / cast(s + ({M} - n_registers) * {Q2_49} as double))"
    )
    con = duckdb.connect()
    want = con.execute(f"""
WITH h AS (
  SELECT (('0x' || substr(md5(v),1,15))::bigint) AS x
  FROM read_parquet('{pq}/*.parquet') WHERE v IS NOT NULL
),
regs AS (
  SELECT x // {Q2_48} AS bucket,
         max(CASE WHEN x % {Q2_48} > 0
                  THEN 48 - length(bin(x % {Q2_48})) + 1 ELSE 49 END) AS rho
  FROM h GROUP BY 1
),
agg AS (
  SELECT count(*) AS n_registers,
         sum(cast(pow(cast(2 as double), 49 - rho) as bigint)) AS s
  FROM regs
)
SELECT n_registers,
       round(CASE WHEN {raw} <= {2.5 * M!r} AND ({M} - n_registers) > 0
             THEN cast({M} as double)
                  * ln(cast({M} as double) / cast({M} - n_registers as double))
             ELSE {raw} END, 4) AS est
FROM agg
""").fetchone()
    assert (got.n_registers, got.est_distinct) == (want[0], want[1])


def test_persisted_append_heal_idempotent(spark, tmp_path):
    """save → append → estimate equals the one-shot sketch; a REPLAYED
    append changes nothing (max-merge absorbs it); a torn staged swap
    heals on open."""
    path = str(tmp_path / "hll")
    a = _vals(spark, 10_000)
    b = _vals(spark, 10_000, start=5_000)  # overlaps a
    sk.save_hll(sk.hll_registers(a, "v", p=12, hash_mode="md5"),
                path, p=12, hash_mode="md5")
    sk.hll_append(b, path, "v")
    sk.hll_append(b, path, "v")  # the replay
    stored, params = sk.load_hll(spark, path)
    assert params == {"p": 12, "hash_mode": "md5"}
    got = sorted(map(tuple, stored.collect()))
    one = sorted(map(tuple, sk.hll_registers(
        a.unionByName(b), "v", p=12, hash_mode="md5").collect()))
    assert got == one

    # torn swap: live renamed out, only the backup remains
    import os

    os.rename(path, path + "__pre_compact")
    assert sk.heal_hll(spark, path) is not None
    stored2, _ = sk.load_hll(spark, path)
    assert sorted(map(tuple, stored2.collect())) == got


def test_guards(spark):
    df = _vals(spark, 10)
    with pytest.raises(DVConfigurationError, match="p must be"):
        sk.hll_registers(df, "v", p=30)
    with pytest.raises(DVConfigurationError, match="hash_mode"):
        sk.hll_registers(df, "v", hash_mode="sha9")
    with pytest.raises(DVConfigurationError, match="at least one"):
        sk.hll_merge()


def test_registers_plan_no_window_no_python(spark):
    """Register building is one groupBy with map-side combine — no
    windows, no Python stages, bounded per-task state at any skew."""
    from mallarddv_spark.plans.audit import plan_report

    regs = sk.hll_registers(_vals(spark, 1000), "v", p=12)
    rep = plan_report(regs)
    assert rep["python_stages"] == 0
    plan = regs._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition" not in plan


# --- count-min sketch ------------------------------------------------------


def test_cm_never_undercounts_and_bounds_overcount(spark):
    """CM estimates are exact-or-over, never under; with d=4, w=2048 and
    ~10k items the expected over-count is ~e*N/w ≈ 13 — assert a loose
    bound."""
    df = spark.range(10_000).select(
        F.concat(F.lit("t"), (F.col("id") % 1000)).alias("v")
    )  # every value occurs exactly 10 times
    counts = sk.cm_counts(df, "v", d=4, w=2048)
    probes = spark.createDataFrame(
        [(f"t{i}",) for i in range(0, 1000, 97)] + [("never-seen",)],
        "v string",
    )
    got = {r.v: r.est_count
           for r in sk.cm_query(counts, probes, "v", d=4, w=2048).collect()}
    for v, est in got.items():
        true = 10 if v != "never-seen" else 0
        assert est >= true, (v, est)
        assert est <= true + 60, (v, est)


def test_cm_query_probe_column_collisions(spark):
    """A probe frame carrying its own row/col/cnt columns must not
    trigger an ambiguous-reference error — the internal join keys are
    __-aliased. The caller's columns survive in the output."""
    df = spark.createDataFrame([("a",)] * 5 + [("b",)] * 2, "v string")
    counts = sk.cm_counts(df, "v", d=3, w=64)
    probes = spark.createDataFrame(
        [("a", 1, 2, 3), ("b", 4, 5, 6)], "v string, row int, col int, cnt int"
    )
    got = {r.v: r for r in sk.cm_query(counts, probes, "v", d=3, w=64).collect()}
    assert got["a"].est_count >= 5 and got["b"].est_count >= 2
    assert got["a"].row == 1 and got["a"].col == 2 and got["a"].cnt == 3


def test_cm_merge_and_weights(spark):
    """Merging two batch sketches equals one sketch over the union;
    weight_col folds pre-aggregated counts."""
    a = spark.createDataFrame([("x",), ("x",), ("y",)], "v string")
    b = spark.createDataFrame([("x",), ("z",)], "v string")
    m = sk.cm_merge(sk.cm_counts(a, "v", d=3, w=64),
                    sk.cm_counts(b, "v", d=3, w=64))
    one = sk.cm_counts(a.unionByName(b), "v", d=3, w=64)
    assert sorted(map(tuple, m.collect())) == sorted(map(tuple, one.collect()))
    wdf = spark.createDataFrame([("x", 3), ("y", 1), ("z", 1)],
                                "v string, n int")
    wsk = sk.cm_counts(wdf, "v", d=3, w=64, weight_col="n")
    assert sorted(map(tuple, wsk.collect())) == sorted(map(tuple, one.collect()))
    probes = spark.createDataFrame([("x",), ("z",)], "v string")
    got = {r.v: r.est_count
           for r in sk.cm_query(one, probes, "v", d=3, w=64).collect()}
    assert got["x"] >= 3 and got["z"] >= 1


def test_cm_md5_replays_in_duckdb(spark, tmp_path):
    """md5-mode count tables are exact integers — the replay is
    trivially byte-identical, which is what makes the sketch shareable
    across engines."""
    pq = str(tmp_path / "cmvals.parquet")
    spark.range(5_000).select(
        F.concat(F.lit("w"), (F.col("id") % 500)).alias("v")
    ).write.parquet(pq)
    df = spark.read.parquet(pq)
    got = sorted(map(tuple,
                     sk.cm_counts(df, "v", d=3, w=256,
                                  hash_mode="md5").collect()))
    con = duckdb.connect()
    want = sorted(con.execute(f"""
WITH v AS (SELECT v FROM read_parquet('{pq}/*.parquet') WHERE v IS NOT NULL),
probes AS (
  SELECT i AS row,
         cast((('0x' || substr(md5(i || ':' || v),1,15))::bigint) % 256
              as int) AS col
  FROM v, unnest([0, 1, 2]) u(i)
)
SELECT row, col, count(*) AS cnt FROM probes GROUP BY 1, 2
""").fetchall())
    assert got == want


def test_cm_persist_append_heal(spark, tmp_path):
    """save → append accumulates (documented NON-idempotence: a replayed
    batch double-counts); a torn swap heals on open."""
    import os

    path = str(tmp_path / "cm")
    a = spark.createDataFrame([("x",), ("y",)], "v string")
    sk.save_cm(sk.cm_counts(a, "v", d=3, w=64), path, d=3, w=64,
               hash_mode="xxhash64")
    sk.cm_append(a, path, "v")  # the replay: x,y now count 2 each
    stored, params = sk.load_cm(spark, path)
    probes = spark.createDataFrame([("x",)], "v string")
    est = sk.cm_query(stored, probes, "v", d=3, w=64).first().est_count
    assert est == 2  # over-count is the documented at-least-once state
    os.rename(path, path + "__pre_compact")
    assert sk.heal_cm(spark, path) is not None
    stored2, _ = sk.load_cm(spark, path)
    assert sorted(map(tuple, stored2.collect())) == sorted(
        map(tuple, stored.collect()))


def test_cm_query_broadcast_threshold(spark):
    """A default-width sketch broadcasts its count table; a wide sketch
    (d·w over the ~2M-cell threshold) must NOT force a broadcast — a
    2^24-wide count table force-broadcast is a driver OOM at scale."""
    df = _vals(spark, 200)
    probes = df.limit(5)
    small = sk.cm_counts(df, "v", d=4, w=2048)
    plan_small = sk.cm_query(small, probes, "v", d=4, w=2048)._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in plan_small
    wide = sk.cm_counts(df, "v", d=4, w=1 << 22)
    out_wide = sk.cm_query(wide, probes, "v", d=4, w=1 << 22)
    # no FORCED broadcast hint on a wide sketch — the planner (stats or
    # AQE) may still pick a broadcast when the table turns out tiny,
    # which is the desired adaptive behavior; the hint would force it
    # even at 2^24 × 16 cells
    plan_wide = out_wide._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in plan_wide
    # estimates still exact for unique values at this width
    assert all(r.est_count == 1 for r in out_wide.collect())


def test_cm_guards(spark):
    df = spark.createDataFrame([("x",)], "v string")
    with pytest.raises(DVConfigurationError, match="d must be"):
        sk.cm_counts(df, "v", d=0)
    with pytest.raises(DVConfigurationError, match="w must be"):
        sk.cm_counts(df, "v", w=2)
    with pytest.raises(DVConfigurationError, match="hash_mode"):
        sk.cm_counts(df, "v", hash_mode="crc")


# --- fixed-range histogram sketch ------------------------------------------


def test_hist_quantiles_accuracy_and_merge(spark):
    """Uniform data: quantiles land within one bin width; merging two
    overlapping halves equals the one-shot histogram (exact integer
    counts)."""
    df = spark.range(100_000).select(
        (F.col("id") % 10_000).cast("double").alias("v")
    )
    h = sk.hist_counts(df, "v", lo=0.0, hi=10_000.0, n_bins=256)
    q = {r.p: r.est for r in sk.hist_quantiles(
        h, 0.0, 10_000.0, 256, [0.0, 0.5, 0.95, 1.0]).collect()}
    width = 10_000.0 / 256
    assert abs(q[0.5] - 5_000.0) <= width
    assert abs(q[0.95] - 9_500.0) <= width
    assert q[0.0] == 0.0 and q[1.0] == 10_000.0
    h1 = sk.hist_counts(df.filter("id % 2 = 0"), "v", 0.0, 10_000.0, 256)
    h2 = sk.hist_counts(df.filter("id % 2 = 1"), "v", 0.0, 10_000.0, 256)
    assert sorted(map(tuple, sk.hist_merge(h1, h2).collect())) == sorted(
        map(tuple, h.collect()))


def test_hist_grouped_underflow_overflow_and_guards(spark):
    """Per-group quantiles; out-of-range values land in the explicit
    under/overflow bins and clamp the extreme quantiles to the declared
    range; guards reject bad geometry."""
    rows = [("a", float(v)) for v in range(100)]
    rows += [("b", float(v) * 10) for v in range(100)]
    rows += [("a", -50.0), ("a", 5000.0)]  # under + overflow
    df = spark.createDataFrame(rows, "g string, v double")
    h = sk.hist_counts(df, "v", lo=0.0, hi=1000.0, n_bins=100, by=["g"])
    bins = {r.g: r.bin for r in h.filter("bin IN (-1, 100)").collect()}
    assert bins == {"a": -1} or set(
        (r.g, r.bin) for r in h.filter("bin IN (-1, 100)").collect()
    ) == {("a", -1), ("a", 100)}
    q = {(r.g, r.p): r.est for r in sk.hist_quantiles(
        h, 0.0, 1000.0, 100, [0.0, 0.5, 1.0], by=["g"]).collect()}
    assert q[("a", 0.0)] == 0.0          # underflow clamps to lo
    assert q[("a", 1.0)] == 1000.0       # overflow clamps to hi
    # group b spreads 10x wider than a → median ~10x higher
    assert q[("b", 0.5)] > 4 * q[("a", 0.5)]
    with pytest.raises(DVConfigurationError, match="lo < hi"):
        sk.hist_counts(df, "v", lo=5.0, hi=5.0)
    with pytest.raises(DVConfigurationError, match="n_bins"):
        sk.hist_counts(df, "v", lo=0.0, hi=1.0, n_bins=1)


def test_hist_replays_in_duckdb(spark, tmp_path):
    """Bin counts AND interpolated estimates match a closed-form DuckDB
    replay — the contract behind the hist_p50/hist_p95 gate columns."""
    pq = str(tmp_path / "hv.parquet")
    spark.range(7_919).select(
        ((F.col("id") * 37) % 1000).cast("double").alias("v")
    ).write.parquet(pq)
    df = spark.read.parquet(pq)
    h = sk.hist_counts(df, "v", lo=0.0, hi=1000.0, n_bins=64)
    got = {r.p: r.est for r in sk.hist_quantiles(
        h, 0.0, 1000.0, 64, [0.5, 0.9]).collect()}
    width = 1000.0 / 64
    con = duckdb.connect()
    want = dict(con.execute(f"""
WITH hb AS (
  SELECT CASE WHEN v < 0.0 THEN -1 WHEN v >= 1000.0 THEN 64
              ELSE least(cast(floor((v - 0.0) / {width!r}) as int), 63) END AS bin,
         count(*) AS cnt
  FROM read_parquet('{pq}/*.parquet') WHERE v IS NOT NULL GROUP BY 1
),
hc AS (SELECT *, sum(cnt) OVER (ORDER BY bin
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM hb),
hc2 AS (SELECT *, cum - cnt AS before FROM hc),
ht AS (SELECT sum(cnt) AS n FROM hb),
hp(p) AS (VALUES (cast(0.5 as double)), (cast(0.9 as double))),
hj AS (
  SELECT p.p, min(c.bin) AS bin FROM hc2 c, ht t, hp p
  WHERE p.p * cast(t.n as double) <= c.cum OR c.cum = t.n GROUP BY 1
)
SELECT j.p, round(least(greatest(
  CASE WHEN c.bin < 0 THEN 0.0 WHEN c.bin >= 64 THEN 1000.0
       ELSE 0.0 + (cast(c.bin as double)
            + (j.p * cast(t.n as double) - cast(c.before as double))
              / cast(c.cnt as double)) * {width!r} END, 0.0), 1000.0), 6)
FROM hj j JOIN hc2 c ON c.bin = j.bin, ht t
""").fetchall())
    assert got == want, (got, want)


# ---------------------------------------------------------------------------
# KMV bottom-k
# ---------------------------------------------------------------------------


def test_kmv_exact_below_k(spark):
    """Fewer than k distinct values: the sketch IS the value set, the
    estimate is exact, and duplicates/NULLs are absorbed."""
    df = _vals(spark, 50).unionByName(_vals(spark, 50)).unionByName(
        spark.createDataFrame([(None,)], "v string")
    )
    s = sk.kmv_sketch(df, "v", k=256)
    assert s.count() == 50
    est = sk.kmv_distinct(s, k=256).first()
    assert (est.n_kept, est.est_distinct) == (50, 50.0)


def test_kmv_estimate_within_error_band(spark):
    """20k distinct at k=1024: the (k-1)·H/h_k estimator lands within
    3/√k ≈ 9.4% of truth for both hash modes."""
    df = _vals(spark, 20_000)
    for mode in ("md5", "xxhash64"):
        est = sk.kmv_distinct(
            sk.kmv_sketch(df, "v", k=1024, hash_mode=mode), k=1024
        ).first().est_distinct
        assert abs(est - 20_000) / 20_000 < 0.094, (mode, est)


def test_kmv_merge_lossless_and_idempotent(spark):
    """Merging two overlapping halves equals the one-shot sketch, and
    re-merging one half again (a replayed batch) changes nothing — the
    self-absorbing property CM/histogram appends do not have."""
    df = _vals(spark, 5_000)
    h1 = sk.kmv_sketch(df.filter("substr(v, 2) < '3'"), "v", k=512)
    h2 = sk.kmv_sketch(df.filter("substr(v, 2) >= '2'"), "v", k=512)
    merged = sk.kmv_merge(h1, h2, k=512)
    one = sk.kmv_sketch(df, "v", k=512)
    as_rows = lambda d: sorted((r.rnk, r.h, r.val) for r in d.collect())
    assert as_rows(merged) == as_rows(one)
    again = sk.kmv_merge(merged, h2, k=512)
    assert as_rows(again) == as_rows(one)


def test_kmv_quantiles_grouped(spark):
    """Quantiles of the distinct-value distribution per group: exact
    sample quantiles below k, rank error within 3/√k above it."""
    df = spark.range(10_000).selectExpr(
        "cast(id % 2 as string) AS g", "cast(id as double) AS v"
    )
    s = sk.kmv_sketch(df, "v", k=512, by=["g"])
    got = {(r.g, r.p): r.est
           for r in sk.kmv_quantiles(s, [0.5, 0.9], by=["g"]).collect()}
    # group values are uniform on [0, 10000) — each quantile must land
    # within the sampling rank error of the population quantile
    for (g, p), est in got.items():
        assert abs(est - p * 10_000) < 3 / (512 ** 0.5) * 10_000, (g, p, est)


def test_kmv_md5_replays_in_duckdb(spark, tmp_path):
    """Sketch rows, the distinct estimate, AND a quantile estimate match
    a closed-form DuckDB replay byte-for-byte — the contract behind the
    kmv gate columns."""
    pq = str(tmp_path / "kv.parquet")
    # numeric string values: the quantile leg casts them to double, and
    # int -> string renders identically in both engines
    spark.range(3_000).select(
        ((F.col("id") * 37) % 10_000).cast("string").alias("v")
    ).write.parquet(pq)
    df = spark.read.parquet(pq)
    s = sk.kmv_sketch(df, "v", k=256, hash_mode="md5")
    got_rows = sorted((r.rnk, r.h, r.val) for r in s.collect())
    got_est = sk.kmv_distinct(s, k=256).first().est_distinct
    got_q = {r.p: r.est for r in sk.kmv_quantiles(s, [0.5]).collect()}
    con = duckdb.connect()
    want_rows = con.execute(f"""
WITH d AS (SELECT DISTINCT v AS val FROM read_parquet('{pq}/*.parquet')
           WHERE v IS NOT NULL),
h AS (SELECT val, (('0x' || substr(md5(val),1,15))::bigint) AS h FROM d),
r AS (SELECT *, row_number() OVER (ORDER BY h, val) AS rnk FROM h)
SELECT rnk, h, val FROM r WHERE rnk <= 256 ORDER BY rnk
""").fetchall()
    assert got_rows == [(int(a), int(b), c) for a, b, c in want_rows]
    want_est, want_q = con.execute(f"""
WITH d AS (SELECT DISTINCT v AS val FROM read_parquet('{pq}/*.parquet')
           WHERE v IS NOT NULL),
h AS (SELECT val, (('0x' || substr(md5(val),1,15))::bigint) AS h FROM d),
r AS (SELECT *, row_number() OVER (ORDER BY h, val) AS rnk FROM h),
s AS (SELECT * FROM r WHERE rnk <= 256),
est AS (SELECT CASE WHEN count(*) < 256 THEN round(cast(count(*) as double), 4)
                    ELSE round(255.0 * cast(1152921504606846976 as double)
                               / cast(max(h) as double), 4) END AS e FROM s),
vr AS (SELECT *, row_number() OVER (ORDER BY cast(val as double), val) AS vr,
              count(*) OVER () AS n FROM s)
SELECT (SELECT e FROM est),
       (SELECT round(cast(val as double), 6) FROM vr
        WHERE vr = greatest(1, cast(ceil(0.5 * n) as bigint)))
""").fetchone()
    assert got_est == want_est
    assert got_q[0.5] == want_q


def test_kmv_persist_append_heal(spark, tmp_path):
    """save → append → estimate equals the one-shot sketch over both
    batches; a REPLAYED append is a no-op (idempotent); a torn staged
    swap heals on open."""
    import os
    import shutil

    path = str(tmp_path / "kmv")
    b1, b2 = _vals(spark, 2_000), _vals(spark, 2_000, start=1_500)
    sk.save_kmv(sk.kmv_sketch(b1, "v", k=512), path, k=512, hash_mode="md5")
    sk.kmv_append(b2, path, "v")
    stored, p = sk.load_kmv(spark, path)
    assert p == {"k": 512, "hash_mode": "md5"}
    one = sk.kmv_sketch(b1.unionByName(b2), "v", k=512)
    as_rows = lambda d: sorted((r.rnk, r.h, r.val) for r in d.collect())
    assert as_rows(stored) == as_rows(one)
    sk.kmv_append(b2, path, "v")  # replay
    stored2, _ = sk.load_kmv(spark, path)
    assert as_rows(stored2) == as_rows(one)
    # torn swap: stage a compact dir, kill before rename
    shutil.copytree(path, path + "__compact")
    assert sk.heal_kmv(spark, path) is not None
    assert not os.path.exists(path + "__compact")
    stored3, _ = sk.load_kmv(spark, path)
    assert as_rows(stored3) == as_rows(one)


def test_kmv_plan_and_guards(spark):
    """The bottom-k cut is limit-protected in BOTH shapes — global
    sketches plan a TakeOrderedAndProject (per-task top-k + driver
    merge), grouped sketches Partial+Final WindowGroupLimit — so no
    group's value set ever serializes pre-cut; zero Python stages."""
    from mallarddv_spark.plans.audit import plan_report

    df = _vals(spark, 100)
    s = sk.kmv_sketch(df, "v", k=16)
    plan = s._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert plan_report(s)["python_stages"] == 0
    g = sk.kmv_sketch(
        df.withColumn("g", F.expr("substr(v, 2, 1)")), "v", k=16, by=["g"]
    )
    gplan = g._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in gplan
    assert plan_report(g)["python_stages"] == 0
    with pytest.raises(DVConfigurationError, match="k must be"):
        sk.kmv_sketch(df, "v", k=1)
    with pytest.raises(DVConfigurationError, match="at least one"):
        sk.kmv_merge(k=16)


def test_kmv_set_estimates(spark):
    """Beyer et al. overlap estimates: exact below k, within the
    sampling error band above it, and the asymmetric containment shows
    in est_intersection."""
    # A = [0, 3000), B = [2000, 6000): |A∩B| = 1000, |A∪B| = 6000, J = 1/6
    a = _vals(spark, 3_000)
    b = _vals(spark, 4_000, start=2_000)
    # exact regime: k larger than the union
    sa = sk.kmv_sketch(a, "v", k=8_192)
    sb = sk.kmv_sketch(b, "v", k=8_192)
    got = sk.kmv_set_estimates(sa, sb, k=8_192).first()
    assert got.n_union_kept == 6_000
    assert got.est_union == 6_000.0
    assert got.est_intersection == 1_000.0
    assert abs(got.jaccard - 1 / 6) < 1e-6
    # estimator regime: k = 1024 — J std err ≈ sqrt(J(1-J)/k) ≈ 0.012
    sa = sk.kmv_sketch(a, "v", k=1_024)
    sb = sk.kmv_sketch(b, "v", k=1_024)
    est = sk.kmv_set_estimates(sa, sb, k=1_024).first()
    assert abs(est.jaccard - 1 / 6) < 0.05
    assert abs(est.est_union - 6_000) / 6_000 < 0.094
    assert abs(est.est_intersection - 1_000) / 1_000 < 0.35


def test_kmv_set_estimates_grouped_and_disjoint(spark):
    """Per-group overlap; disjoint groups report zero intersection."""
    a = spark.range(1_000).selectExpr(
        "cast(id % 2 as string) AS g", "concat('v', id) AS v"
    )
    # group 0 shares everything with a; group 1 shares nothing
    b = spark.range(1_000).selectExpr(
        "cast(id % 2 as string) AS g",
        "CASE WHEN id % 2 = 0 THEN concat('v', id)"
        "     ELSE concat('w', id) END AS v"
    )
    sa = sk.kmv_sketch(a, "v", k=2_048, by=["g"])
    sb = sk.kmv_sketch(b, "v", k=2_048, by=["g"])
    got = {r.g: r for r in
           sk.kmv_set_estimates(sa, sb, k=2_048, by=["g"]).collect()}
    assert got["0"].jaccard == 1.0 and got["0"].est_intersection == 500.0
    assert got["1"].jaccard == 0.0 and got["1"].est_intersection == 0.0
