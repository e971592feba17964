"""DSIR importance resampling (operators/curation): DuckDB differential
on the real corpus, semantic pull-toward-target check, Gumbel-sample
determinism, persisted-λ parity, edge cases, and plan pins.

Reference scope note: no data-selection stage exists in the reference
engine — this extends the training-data curation tier.
"""

import duckdb
import pytest
from pyspark.sql import Row, functions as F

from mallarddv_spark.exceptions import DVConfigurationError
from mallarddv_spark.operators.curation import (
    dsir_importance,
    dsir_log_ratio,
    dsir_resample,
    hashed_ngram_features,
    ngram_bucket_distribution,
)
from mallarddv_spark.plans.audit import plan_report

SF = "/root/testdata/sf0.001"

DUCK_DSIR = r"""
WITH toks AS (
  SELECT doc_id, source, string_split_regex(trim(lower(text)), '\s+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, source, w AS g FROM (
    SELECT doc_id, source, unnest(t) AS w FROM toks) WHERE g <> ''
  UNION ALL
  SELECT doc_id, source, t[i] || ' ' || t[i+1] AS g
  FROM toks, unnest(generate_series(1, len(t) - 1)) u(i)
),
feats AS (
  SELECT doc_id, source,
         (('0x' || substr(md5(g),1,15))::bigint) % 4096 AS b
  FROM grams
),
rawd AS (SELECT b, count(*) AS cr FROM feats GROUP BY b),
tgtd AS (SELECT b, count(*) AS ct FROM feats WHERE source = 'src0' GROUP BY b),
tot AS (SELECT (SELECT sum(cr) FROM rawd) AS R,
               (SELECT coalesce(sum(ct), 0) FROM tgtd) AS T),
lam AS (
  SELECT rawd.b,
         cast(round(1e10 * (ln((coalesce(ct,0) + 1.0) / (T + 1.0*4096))
                           - ln((cr + 1.0) / (R + 1.0*4096)))) as bigint)
           AS lam10
  FROM rawd LEFT JOIN tgtd ON rawd.b = tgtd.b, tot
),
docw AS (
  SELECT f.doc_id, count(*) AS n_grams, sum(lam10) AS w10
  FROM feats f JOIN lam ON f.b = lam.b GROUP BY f.doc_id
),
keyed AS (
  SELECT doc_id, n_grams, round(w10 / 1e10, 6) AS logw,
         round(round(w10 / 1e10, 6)
           + (-ln(-ln(((((('0x' || substr(md5('dsir-v1|'
                || cast(doc_id AS varchar)),1,15))::bigint) % 1048576)
                + 0.5)) / 1048576.0))), 6) AS gkey
  FROM docw
),
r AS (SELECT row_number() OVER (ORDER BY gkey DESC, doc_id) AS rnk, *
      FROM keyed)
SELECT doc_id, n_grams, logw, gkey, rnk FROM r WHERE rnk <= 50 ORDER BY rnk
"""


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_duckdb_differential(spark, docs):
    """Full pipeline (md5 portable mode) matches a closed-form DuckDB
    replay bit-for-bit, doubles included."""
    w = dsir_importance(
        docs, docs.filter(F.col("source") == "src0"), "doc_id", "text",
        buckets=4096, n_max=2, smoothing=1.0, hash_mode="md5",
    )
    s = dsir_resample(w, 50, hash_mode="md5", seed="dsir-v1")
    got = [
        (r.doc_id, r.n_grams, r.logw, r.gkey, r.rnk)
        for r in s.orderBy("rnk").collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = [tuple(x) for x in con.execute(DUCK_DSIR).fetchall()]
    assert got == want


def test_weights_pull_toward_target(spark):
    """Docs sharing the target's distinctive vocabulary must outweigh
    docs that don't — the whole point of importance weighting."""
    target = spark.createDataFrame(
        [Row(doc_id=i, text="quantum flux lattice boson " * 5)
         for i in range(8)]
    )
    raw = spark.createDataFrame(
        [Row(doc_id=100 + i, text="quantum flux lattice boson " * 5)
         for i in range(4)]
        + [Row(doc_id=200 + i, text="cat dog fish bird " * 5)
           for i in range(4)]
    )
    w = dsir_importance(raw, target, "doc_id", "text", buckets=512)
    rows = {r.doc_id: r.logw for r in w.collect()}
    on_target = [rows[100 + i] for i in range(4)]
    off_target = [rows[200 + i] for i in range(4)]
    assert min(on_target) > max(off_target)


def test_resample_deterministic_and_ranked(spark, docs):
    w = dsir_importance(
        docs, docs.filter(F.col("lang") == "en"), "doc_id", "text",
        buckets=1024,
    ).cache()
    try:
        a = dsir_resample(w, 20, seed="s1").orderBy("rnk").collect()
        b = dsir_resample(w, 20, seed="s1").orderBy("rnk").collect()
        c = dsir_resample(w, 20, seed="s2").orderBy("rnk").collect()
        assert a == b
        assert [r.doc_id for r in a] != [r.doc_id for r in c]
        assert [r.rnk for r in a] == list(range(1, 21))
        keys = [r.gkey for r in a]
        assert keys == sorted(keys, reverse=True)
    finally:
        w.unpersist()


def test_persisted_log_ratio_parity(spark, docs, tmp_path):
    """λ persisted to parquet and passed back in reproduces the inline
    weights exactly — the deployment path (target stats computed once)."""
    tgt = docs.filter(F.col("source") == "src1")
    inline = dsir_importance(docs, tgt, "doc_id", "text", buckets=2048)
    feats = hashed_ngram_features(docs, "doc_id", "text", buckets=2048)
    lam = dsir_log_ratio(
        ngram_bucket_distribution(feats),
        ngram_bucket_distribution(
            hashed_ngram_features(tgt, "doc_id", "text", buckets=2048)
        ),
        2048,
    )
    p = str(tmp_path / "lam")
    lam.write.parquet(p)
    stored = dsir_importance(
        docs, None, "doc_id", "text", buckets=2048,
        log_ratio=spark.read.parquet(p),
    )
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, stored.collect())
    )


def test_edge_docs(spark):
    """Empty docs vanish (no features); one-token docs carry exactly one
    gram; n_max=1 skips bigrams entirely."""
    df = spark.createDataFrame(
        [Row(doc_id=1, text=""), Row(doc_id=2, text="  "),
         Row(doc_id=3, text="solo"), Row(doc_id=4, text="two words")]
    )
    f = hashed_ngram_features(df, "doc_id", "text", buckets=64)
    per_doc = {
        r.doc_id: r.n for r in
        f.groupBy("doc_id").agg(F.sum("cnt").alias("n")).collect()
    }
    assert 1 not in per_doc and 2 not in per_doc
    assert per_doc[3] == 1          # one unigram, no bigram
    assert per_doc[4] == 3          # two unigrams + one bigram
    f1 = hashed_ngram_features(df, "doc_id", "text", buckets=64, n_max=1)
    per_doc1 = {
        r.doc_id: r.n for r in
        f1.groupBy("doc_id").agg(F.sum("cnt").alias("n")).collect()
    }
    assert per_doc1[4] == 2         # unigrams only


def test_guards(spark, docs):
    with pytest.raises(DVConfigurationError, match="buckets"):
        hashed_ngram_features(docs, "doc_id", "text", buckets=0)
    with pytest.raises(DVConfigurationError, match="n_max"):
        hashed_ngram_features(docs, "doc_id", "text", n_max=0)
    with pytest.raises(DVConfigurationError, match="smoothing"):
        dsir_log_ratio(docs.limit(0), docs.limit(0), 8, smoothing=0)
    w = spark.createDataFrame([Row(doc_id=1, logw=0.0)])
    with pytest.raises(DVConfigurationError, match="k must be positive"):
        dsir_resample(w, 0)
    with pytest.raises(DVConfigurationError, match="hash_mode"):
        dsir_resample(w, 1, hash_mode="crc32")


def test_plan_shapes(spark, docs):
    """Scale pins: the λ join must be broadcast (corpus never shuffles on
    the bucket key), no Python stages anywhere, and the top-k must
    compile to TakeOrdered — not a global sort exchange."""
    w = dsir_importance(
        docs, docs.filter(F.col("source") == "src0"), "doc_id", "text",
        buckets=4096,
    )
    rep = plan_report(w)
    assert rep["python_stages"] == 0
    assert rep["broadcast_hash_joins"] >= 1
    # exactly the two deliberate single-row totals broadcasts
    # (R·T cross joins); anything more would be a real nested loop
    assert rep["nested_loop_joins"] <= 2
    plan = dsir_resample(w, 10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
