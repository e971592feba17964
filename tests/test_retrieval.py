"""BM25 lexical retrieval (operators/retrieval): DuckDB differential on
the real corpus, semantic ranking sanity, persisted-index round-trip /
append / compact / crash-heal, partition-pruned probes, and guards.

Reference scope note: no retrieval tier exists in the reference engine —
this extends the training-data curation family alongside the embedding
ANN operators.
"""

import duckdb
import pytest
from pyspark.sql import Row

from mallarddv_spark.exceptions import DVConfigurationError
from mallarddv_spark.operators.retrieval import (
    bm25_index_append,
    bm25_index_compact,
    bm25_index_probe,
    bm25_topk,
    build_bm25_index,
    build_postings,
    heal_bm25_index,
)
from mallarddv_spark.plans.audit import plan_report

SF = "/root/testdata/sf0.001"

QUERIES = [
    ("q_hash", "hash join table"),
    ("q_sort", "window sort order"),
    ("q_dup", "stream batch data dup"),
]

DUCK_BM25 = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\s+'),
                     x -> x <> '') AS t
  FROM documents
),
post AS (
  SELECT term, doc_id, dl, count(*) AS tf FROM (
    SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM toks
  ) GROUP BY term, doc_id, dl
),
tot AS (SELECT count(*) AS n_docs, sum(len(t)) AS total_len
        FROM toks WHERE len(t) > 0),
queries(query_id, query) AS (VALUES {queries}),
qt AS (
  SELECT DISTINCT query_id,
         unnest(list_filter(string_split_regex(trim(lower(query)), '\s+'),
                            x -> x <> '')) AS term
  FROM queries
),
m AS (
  SELECT p.*, count(*) OVER (PARTITION BY p.term) AS dfreq
  FROM post p JOIN (SELECT DISTINCT term FROM qt) q USING (term)
),
c AS (
  SELECT term, doc_id,
         cast(round(1e10 * (
           ln(1 + (n_docs - dfreq + 0.5) / (dfreq + 0.5))
           * tf * (1 + 1.2)
           / (tf + 1.2 * (1 - 0.75 + 0.75 * dl * n_docs / total_len))
         )) AS bigint) AS c10
  FROM m, tot
),
s AS (
  SELECT qt.query_id, c.doc_id, count(*) AS n_terms, sum(c10) AS s10
  FROM c JOIN qt USING (term) GROUP BY qt.query_id, c.doc_id
),
r AS (
  SELECT query_id, doc_id, n_terms, round(s10 / 1e10, 6) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY s10 DESC, doc_id) AS rnk
  FROM s
)
SELECT query_id, doc_id, n_terms, score, rnk FROM r WHERE rnk <= {k}
ORDER BY query_id, rnk
"""


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(
        [Row(query_id=q, query=t) for q, t in QUERIES]
    )


def _duck(k: int):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    vals = ", ".join(f"('{q}', '{t}')" for q, t in QUERIES)
    return [
        tuple(x)
        for x in con.execute(
            DUCK_BM25.format(queries=vals, k=k)
        ).fetchall()
    ]


def _rows(df):
    return [
        (r.query_id, r.doc_id, r.n_terms, r.score, r.rnk)
        for r in df.orderBy("query_id", "rnk").collect()
    ]


def test_duckdb_differential(spark, docs, queries):
    """Inline BM25 matches a closed-form DuckDB replay bit-for-bit —
    scores, tie-broken ranks, matched-term counts."""
    got = _rows(bm25_topk(docs, queries, k=20))
    assert got == _duck(20)
    assert len(got) == 3 * 20


def test_ranking_semantics(spark):
    """A doc saturated with the query terms outranks partial matches;
    rare terms outweigh ubiquitous ones (idf)."""
    corpus = spark.createDataFrame(
        [Row(doc_id=1, text="quantum flux quantum flux quantum"),
         Row(doc_id=2, text="quantum noise and other words here"),
         Row(doc_id=3, text="nothing relevant whatsoever in here"),
         # 'common' appears everywhere, 'rare' once
         Row(doc_id=4, text="common rare"),
         Row(doc_id=5, text="common words common words common")]
        + [Row(doc_id=10 + i, text="common filler text") for i in range(5)]
    )
    q = spark.createDataFrame([Row(query_id="a", query="quantum flux"),
                               Row(query_id="b", query="common rare")])
    got = {
        (r.query_id, r.rnk): r.doc_id
        for r in bm25_topk(corpus, q, k=3).collect()
    }
    assert got[("a", 1)] == 1 and got[("a", 2)] == 2
    assert got[("b", 1)] == 4  # the rare term dominates the common one


def test_shared_term_df_not_double_counted(spark):
    """Two queries sharing a term must see the same df for it — the
    per-query expansion happens after df is counted."""
    corpus = spark.createDataFrame(
        [Row(doc_id=i, text="alpha beta") for i in range(4)]
    )
    q1 = spark.createDataFrame([Row(query_id="x", query="alpha")])
    q2 = spark.createDataFrame([Row(query_id="x", query="alpha"),
                                Row(query_id="y", query="alpha beta")])
    s1 = {r.doc_id: r.score
          for r in bm25_topk(corpus, q1, k=10).filter("query_id='x'").collect()}
    s2 = {r.doc_id: r.score
          for r in bm25_topk(corpus, q2, k=10).filter("query_id='x'").collect()}
    assert s1 == s2


def test_empty_and_guards(spark, queries):
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    with pytest.raises(DVConfigurationError, match="empty corpus"):
        bm25_topk(empty, queries, k=5)
    with pytest.raises(DVConfigurationError, match="corpus or postings"):
        bm25_topk(None, queries, k=5)
    # docs with empty text produce no postings and never match
    corpus = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta"), Row(doc_id=2, text="  ")]
    )
    q = spark.createDataFrame([Row(query_id="x", query="alpha")])
    assert [r.doc_id for r in bm25_topk(corpus, q, k=5).collect()] == [1]


def test_postings_shape(spark):
    corpus = spark.createDataFrame([Row(doc_id=1, text="a b a"),
                                    Row(doc_id=2, text="b")])
    rows = {(r.term, r.doc_id): (r.tf, r.dl)
            for r in build_postings(corpus).collect()}
    assert rows == {("a", 1): (2, 3), ("b", 1): (1, 3), ("b", 2): (1, 1)}


def test_index_roundtrip_probe_matches_inline(spark, docs, queries, tmp_path):
    path = str(tmp_path / "bm25")
    build_bm25_index(docs, path)
    got = _rows(bm25_index_probe(spark, path, queries, k=20))
    assert got == _rows(bm25_topk(docs, queries, k=20))


def test_index_probe_prunes_partitions(spark, docs, queries, tmp_path):
    """The probe's postings scan must carry the tbucket IN filter — the
    partition-pruning contract that makes probe I/O ∝ query terms."""
    path = str(tmp_path / "bm25p")
    build_bm25_index(docs, path, term_buckets=32)
    probe = bm25_index_probe(spark, path, queries, k=5)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [tbucket" in plan or "tbucket#" in plan
    # and it still returns the right answer
    assert _rows(probe) == _rows(bm25_topk(docs, queries, k=5))


def test_index_append_matches_full_rebuild(spark, docs, queries, tmp_path):
    path = str(tmp_path / "bm25a")
    build_bm25_index(docs.filter("doc_id % 2 = 0"), path)
    bm25_index_append(docs.filter("doc_id % 2 = 1"), path)
    got = _rows(bm25_index_probe(spark, path, queries, k=20))
    assert got == _rows(bm25_topk(docs, queries, k=20))


def test_index_compact_repairs_replayed_append(spark, docs, queries, tmp_path):
    """A replayed (duplicate) append doubles tf and inflates the totals;
    compact dedups the postings and recomputes totals from ground truth,
    restoring exact parity with the inline path."""
    path = str(tmp_path / "bm25c")
    build_bm25_index(docs.filter("doc_id % 2 = 0"), path)
    batch = docs.filter("doc_id % 2 = 1")
    bm25_index_append(batch, path)
    bm25_index_append(batch, path)  # the replay
    out = bm25_index_compact(spark, path)
    assert out["postings"]["rows_after"] < out["postings"]["rows_before"]
    got = _rows(bm25_index_probe(spark, path, queries, k=20))
    assert got == _rows(bm25_topk(docs, queries, k=20))


def test_index_heals_torn_param_swap(spark, docs, queries, tmp_path):
    """Simulate every crash point of the params staged-rename swap; the
    next open must resolve a complete, correct params copy."""
    path = str(tmp_path / "bm25h")
    build_bm25_index(docs, path)
    want = _rows(bm25_index_probe(spark, path, queries, k=10))

    jvm = spark._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(path).getFileSystem(spark._jsc.hadoopConfiguration())
    live = Path(f"{path}/params")
    staged = Path(f"{path}/params__compact")
    backup = Path(f"{path}/params__pre_compact")

    # crash after staged write, before swap: staged + live
    fs.mkdirs(staged)
    assert heal_bm25_index(spark, path) == {"params": "dropped_staged"}
    assert _rows(bm25_index_probe(spark, path, queries, k=10)) == want

    # crash between rename-out and rename-in: backup only
    fs.rename(live, backup)
    assert heal_bm25_index(spark, path) == {"params": "restored_backup"}
    assert _rows(bm25_index_probe(spark, path, queries, k=10)) == want


def test_index_rejects_unknown_and_no_plan_python(spark, docs, queries):
    """Inline BM25 stays entirely JVM-side — no Python row stages."""
    rep = plan_report(bm25_topk(docs, queries, k=10))
    assert rep["python_stages"] == 0


def test_facade_recover_sweeps_bm25_index(spark, docs, tmp_path):
    """vault.recover(bm25_index_paths=...) resolves a torn params swap —
    the same sweep contract as the MinHash/IVF indexes."""
    import os

    from mallarddv_spark.api import MallardSparkVault

    path = str(tmp_path / "bm25r")
    build_bm25_index(docs, path)
    Path = spark._jvm.org.apache.hadoop.fs.Path
    fs = Path(path).getFileSystem(spark._jsc.hadoopConfiguration())
    fs.rename(Path(f"{path}/params"), Path(f"{path}/params__pre_compact"))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    vault = MallardSparkVault(spark)
    assert vault.init_vault(
        os.path.join(repo, "tests/fixtures/tables.csv"),
        os.path.join(repo, "tests/fixtures/transitions.csv"),
    ) == []
    healed = vault.recover(bm25_index_paths=[path])
    assert healed.get(f"{path}/params (index compaction)") == "restored_backup"
    q = spark.createDataFrame([("q", "hash join")], ["query_id", "query"])
    assert bm25_index_probe(spark, path, q, k=3).count() == 3


# --- property test: Spark BM25 == pure-Python BM25 on arbitrary corpora ---

def _py_bm25(corpus, query_terms, k1=1.2, b=0.75):
    """Pure-Python reference with the SAME 1e-10 grid discipline."""
    import math

    toks = {i: [w for w in t.strip().lower().split() if w]
            for i, t in corpus}
    toks = {i: v for i, v in toks.items() if v}  # N excludes empty docs
    n_docs = len(toks)
    total_len = sum(len(v) for v in toks.values())
    if not n_docs or not total_len:
        return {}
    terms = sorted(set(query_terms))
    dfreq = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    scores = {}
    for i, v in toks.items():
        s10 = 0
        matched = 0
        for t in terms:
            tf = v.count(t)
            if not tf or not dfreq[t]:
                continue
            matched += 1
            idf = math.log(1 + (n_docs - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            c = idf * tf * (1 + k1) / (
                tf + k1 * (1 - b + b * len(v) * n_docs / total_len)
            )
            s10 += int(round(c * 1e10))
        if matched:
            scores[i] = (matched, s10)
    return scores


from hypothesis import given, settings, strategies as st  # noqa: E402

_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
_text = st.lists(_word, min_size=0, max_size=8).map(" ".join)


@settings(max_examples=6, deadline=None)
@given(st.lists(_text, min_size=1, max_size=12),
       st.lists(_word, min_size=1, max_size=3))
def test_bm25_property_matches_python(spark, texts, qwords):
    corpus = [(i, t) for i, t in enumerate(texts)]
    want = _py_bm25(corpus, qwords)
    cdf = spark.createDataFrame(corpus, "doc_id bigint, text string")
    qdf = spark.createDataFrame([("q", " ".join(qwords))],
                                ["query_id", "query"])
    if not any(t.strip() for t in texts):
        with pytest.raises(DVConfigurationError, match="empty corpus"):
            bm25_topk(cdf, qdf, k=100)
        return
    got = {
        r.doc_id: (r.n_terms, r.score)
        for r in bm25_topk(cdf, qdf, k=100).collect()
    }
    assert set(got) == set(want)
    for i, (m, s10) in want.items():
        assert got[i][0] == m
        # Spark rounds HALF_UP, Python HALF_EVEN — compare on the grid
        assert abs(got[i][1] - s10 / 1e10) < 1e-6


def test_index_max_df_frac_prunes_stopwords(spark, tmp_path):
    """Terms above the df cutoff are not stored; probes score them as
    absent while rare terms keep full fidelity."""
    corpus = spark.createDataFrame(
        [Row(doc_id=i, text="common filler rare" if i == 0 else "common filler")
         for i in range(10)]
    )
    path = str(tmp_path / "bm25s")
    build_bm25_index(corpus, path, max_df_frac=0.5)
    stored = {r.term for r in
              spark.read.parquet(f"{path}/postings").select("term").distinct().collect()}
    assert stored == {"rare"}  # 'common'/'filler' have df=10 > 5
    q = spark.createDataFrame([Row(query_id="x", query="common rare")])
    hits = bm25_index_probe(spark, path, q, k=5).collect()
    assert [(r.doc_id, r.n_terms) for r in hits] == [(0, 1)]
    with pytest.raises(DVConfigurationError, match="max_df_frac"):
        build_bm25_index(corpus, str(tmp_path / "bad"), max_df_frac=1.5)


def test_append_honors_stoplist(spark, tmp_path):
    """A term stop-listed at build stays absent after appends — the
    frozen-stoplist contract."""
    base = spark.createDataFrame(
        [Row(doc_id=i, text="common rare" if i == 0 else "common")
         for i in range(10)]
    )
    path = str(tmp_path / "bm25sl")
    build_bm25_index(base, path, max_df_frac=0.5)
    bm25_index_append(
        spark.createDataFrame([Row(doc_id=100, text="common fresh")]), path
    )
    stored = {r.term for r in
              spark.read.parquet(f"{path}/postings")
              .select("term").distinct().collect()}
    assert stored == {"rare", "fresh"}  # 'common' never re-enters


def test_hybrid_rerank(spark):
    """BM25 shortlist re-ranked by embedding cosine: the semantically
    closer doc wins even when its BM25 rank was lower; hits without a
    vector keep their lexical order below all vectored hits."""
    from mallarddv_spark.operators.retrieval import hybrid_rerank_topk

    corpus = spark.createDataFrame(
        [Row(doc_id=1, text="quantum flux quantum flux quantum flux"),
         Row(doc_id=2, text="quantum flux other words"),
         Row(doc_id=3, text="quantum flux unvectored"),
         Row(doc_id=4, text="irrelevant filler entirely")]
    )
    q = spark.createDataFrame([Row(query_id="a", query="quantum flux")])
    hits = bm25_topk(corpus, q, k=10)
    # doc 3 beats doc 2 lexically (shorter dl) — rerank must flip that
    assert [r.doc_id for r in hits.orderBy("rnk").collect()] == [1, 3, 2]

    doc_vecs = spark.createDataFrame(
        [Row(doc_id=1, embedding=[1.0, 0.0]),
         Row(doc_id=2, embedding=[0.9, 0.9]),   # closest to the query
         Row(doc_id=4, embedding=[0.0, 1.0])]   # doc 3 has no vector
    )
    q_vecs = spark.createDataFrame([Row(query_id="a", embedding=[1.0, 1.0])])
    out = hybrid_rerank_topk(hits, doc_vecs, q_vecs, k=10).orderBy("rnk")
    rows = out.collect()
    assert [r.doc_id for r in rows] == [2, 1, 3]
    assert rows[0].cosine > rows[1].cosine
    assert rows[2].cosine is None            # kept, ranked last
    # shortlist-sized work: query vectors broadcast, no nested loops
    from mallarddv_spark.plans.audit import plan_report

    rep = plan_report(hybrid_rerank_topk(hits, doc_vecs, q_vecs, k=10))
    assert rep["python_stages"] == 0 and rep["nested_loop_joins"] == 0


def test_broadcast_escape_hatches_identical(spark, docs, queries):
    """broadcast=False (the million-query batch path: plain shuffled
    joins, no 8 GB ceiling) must produce output identical to the
    default broadcast plan — for both bm25_topk and
    hybrid_rerank_topk."""
    from mallarddv_spark.operators.retrieval import hybrid_rerank_topk

    assert _rows(bm25_topk(docs, queries, k=20)) == _rows(
        bm25_topk(docs, queries, k=20, broadcast=False)
    )

    corpus = spark.createDataFrame(
        [Row(doc_id=1, text="quantum flux quantum flux quantum flux"),
         Row(doc_id=2, text="quantum flux other words"),
         Row(doc_id=3, text="quantum flux unvectored")]
    )
    q = spark.createDataFrame([Row(query_id="a", query="quantum flux")])
    hits = bm25_topk(corpus, q, k=10)
    doc_vecs = spark.createDataFrame(
        [Row(doc_id=1, embedding=[1.0, 0.0]),
         Row(doc_id=2, embedding=[0.9, 0.9])]
    )
    q_vecs = spark.createDataFrame([Row(query_id="a", embedding=[1.0, 1.0])])

    def _rr(df):
        return [(r.query_id, r.doc_id, r.score, r.cosine, r.rnk)
                for r in df.orderBy("query_id", "rnk").collect()]

    assert _rr(hybrid_rerank_topk(hits, doc_vecs, q_vecs, k=10)) == _rr(
        hybrid_rerank_topk(hits, doc_vecs, q_vecs, k=10, broadcast=False)
    )


def test_topk_window_uses_group_limit(spark, docs, queries):
    """The rank filter must plan as Partial+Final WindowGroupLimit —
    every map task keeps only its local top-k per query before the
    shuffle. Without it, a billion matched postings for one query would
    serialize into a single window sort task."""
    plan = (
        bm25_topk(docs, queries, k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan and "Final" in plan


def test_df_is_groupby_not_window(spark, docs, queries):
    """df(term) must be a groupBy aggregate joined back, never a
    count-over-window — a window partitioned by term colocates every
    posting of a stopword term in ONE task before anything can cap it.
    The only window spec in the whole plan is the per-query top-k
    (which IS WindowGroupLimit-protected)."""
    import re

    plan = (
        bm25_topk(docs, queries, k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    specs = set(re.findall(r"windowspecdefinition\((\w+)#", plan))
    assert specs == {"query_id"}, specs


def test_rerank_never_shuffles_doc_vecs(spark):
    """hybrid_rerank_topk prunes doc_vecs via an inner broadcast join on
    the shortlist ids BEFORE the left join — the embedding table is
    probed in place, so no sort-merge join (= no corpus shuffle) may
    appear anywhere in the rerank plan."""
    from pyspark.sql import functions as F

    from mallarddv_spark.operators.retrieval import hybrid_rerank_topk

    hits = spark.range(20).select(
        F.concat(F.lit("q"), (F.col("id") % 2).cast("string")).alias(
            "query_id"
        ),
        F.col("id").alias("doc_id"),
        F.lit(1.0).alias("score"),
        (F.col("id") + 1).alias("rnk"),
    )
    dv = spark.range(100_000).select(
        F.col("id").alias("doc_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    qv = spark.createDataFrame(
        [Row(query_id="q0", embedding=[1.0, 1.0]),
         Row(query_id="q1", embedding=[0.0, 1.0])]
    )
    rep = plan_report(hybrid_rerank_topk(hits, dv, qv, k=10))
    assert rep["sort_merge_joins"] == 0
    assert rep["nested_loop_joins"] == 0


def test_rerank_keeps_query_without_vector(spark):
    """A query with no vector must NOT lose its shortlist — its hits
    keep BM25 order with NULL cosine (symmetric with the vectorless-doc
    contract)."""
    from mallarddv_spark.operators.retrieval import hybrid_rerank_topk

    hits = spark.createDataFrame(
        [Row(query_id="a", doc_id=1, score=2.0, rnk=1),
         Row(query_id="a", doc_id=2, score=1.0, rnk=2),
         Row(query_id="b", doc_id=3, score=3.0, rnk=1),
         Row(query_id="b", doc_id=4, score=2.5, rnk=2)]
    )
    doc_vecs = spark.createDataFrame(
        [Row(doc_id=1, embedding=[1.0, 0.0]),
         Row(doc_id=2, embedding=[0.0, 1.0]),
         Row(doc_id=3, embedding=[1.0, 0.0]),
         Row(doc_id=4, embedding=[0.0, 1.0])]
    )
    q_vecs = spark.createDataFrame([Row(query_id="a", embedding=[0.0, 1.0])])
    rows = hybrid_rerank_topk(hits, doc_vecs, q_vecs, k=10).collect()
    a = [(r.doc_id, r.cosine) for r in sorted(
        (r for r in rows if r.query_id == "a"), key=lambda r: r.rnk)]
    b = [(r.doc_id, r.cosine) for r in sorted(
        (r for r in rows if r.query_id == "b"), key=lambda r: r.rnk)]
    assert a == [(2, 1.0), (1, 0.0)]       # reranked by cosine
    assert b == [(3, None), (4, None)]     # kept, BM25 order, NULL cosine


def test_stoplist_cutoff_uses_tokenized_doc_count(spark, tmp_path):
    """The max_df_frac cutoff must be evaluated against the same N the
    stored totals use (docs with >= 1 token) — empty docs must not
    inflate the threshold and smuggle stopwords into the index."""
    corpus = spark.createDataFrame(
        [Row(doc_id=i, text=f"common u{i}") for i in range(4)]
        + [Row(doc_id=4, text="x y"), Row(doc_id=5, text="x z")]
        + [Row(doc_id=6 + i, text="   ") for i in range(4)]
    )
    path = str(tmp_path / "bm25n")
    build_bm25_index(corpus, path, max_df_frac=0.5)
    # tokenized N = 6 → cutoff 3; 'common' (df=4) must be stop-listed.
    # Against raw count(*) = 10 the cutoff would be 5 and keep it.
    stopped = {r.term for r in
               spark.read.parquet(f"{path}/stoplist").collect()}
    assert "common" in stopped


def test_totals_consistent_with_compact_on_empty_docs(spark, tmp_path):
    """N excludes token-less docs EVERYWHERE — otherwise a compact
    (which recomputes totals from postings) would silently shift stored
    scores relative to the build on any corpus with empty documents."""
    corpus = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta"), Row(doc_id=2, text="alpha"),
         Row(doc_id=3, text="   ")]
    )
    path = str(tmp_path / "bm25e")
    build_bm25_index(corpus, path)
    q = spark.createDataFrame([Row(query_id="x", query="alpha beta")])
    before = _rows(bm25_index_probe(spark, path, q, k=5))
    assert before == _rows(bm25_topk(corpus, q, k=5))
    bm25_index_compact(spark, path)
    assert _rows(bm25_index_probe(spark, path, q, k=5)) == before
    assert spark.read.parquet(f"{path}/params").first().n_docs == 2


# --- reciprocal-rank fusion -------------------------------------------------


def _run(spark, rows):
    return spark.createDataFrame(
        rows, "query_id string, doc_id bigint, rnk bigint"
    )


def test_rrf_fusion_values_and_consensus(spark):
    """Hand-computed RRF (k_rrf=60): a doc ranked mid-list in BOTH runs
    must outrank a doc that tops only one — the consensus property that
    makes RRF the standard fusion baseline. Scores match the closed
    form on the 1e-10 grid."""
    from mallarddv_spark.operators.retrieval import rrf_fuse

    a = _run(spark, [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)])
    b = _run(spark, [("q", 4, 1), ("q", 2, 2), ("q", 3, 3)])
    out = {r.doc_id: r for r in rrf_fuse([a, b], k=None).collect()}
    # doc 2: in both runs at rank 2 -> 2/62; docs 1 and 4: rank 1 once -> 1/61
    assert out[2].n_runs == 2 and out[1].n_runs == 1
    assert out[2].rrf_score == round(round(1e10 / 62) * 2 / 1e10, 6)
    assert out[1].rrf_score == round(round(1e10 / 61) / 1e10, 6)
    assert out[2].rnk == 1                      # consensus at rank 2 wins
    assert out[3].rnk == 2                      # consensus at rank 3 next
    # the two single-run rank-1 docs tie on score; doc id breaks it
    assert out[1].rnk == 3 and out[4].rnk == 4


def test_rrf_weights_and_topk_cut(spark):
    from mallarddv_spark.operators.retrieval import rrf_fuse

    a = _run(spark, [("q", 1, 1), ("q", 2, 2)])
    b = _run(spark, [("q", 2, 1), ("q", 3, 2)])
    # weight run b 3x: doc 3 (rank 2 in b only) beats doc 1 (rank 1 in a)
    out = {r.doc_id: r.rrf_score
           for r in rrf_fuse([a, b], weights=[1.0, 3.0], k=None).collect()}
    assert out[3] > out[1]
    cut = rrf_fuse([a, b], k=1).collect()
    assert len(cut) == 1 and cut[0].doc_id == 2


def test_rrf_plan_group_limit_no_join(spark):
    """The fused cut must plan as WindowGroupLimit, and fusion must be
    union+groupBy — no run-vs-run join anywhere in the plan."""
    from mallarddv_spark.operators.retrieval import rrf_fuse

    a = _run(spark, [("q", 1, 1)])
    b = _run(spark, [("q", 1, 2)])
    plan = (
        rrf_fuse([a, b], k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan
    assert "Join" not in plan


def test_rrf_guards(spark):
    from mallarddv_spark.operators.retrieval import rrf_fuse

    a = _run(spark, [("q", 1, 1)])
    with pytest.raises(DVConfigurationError, match="two runs"):
        rrf_fuse([a])
    with pytest.raises(DVConfigurationError, match="weights"):
        rrf_fuse([a, a], weights=[1.0])
    with pytest.raises(DVConfigurationError, match="k_rrf"):
        rrf_fuse([a, a], k_rrf=0)


def test_rrf_duckdb_differential(spark):
    """Full-composition differential on the real corpus: fuse the BM25
    top-20 with the brute-force cosine top-20 and replay the whole
    thing (both runs + grid fusion) in DuckDB."""
    from mallarddv_spark.functions.litframe import literal_frame
    from mallarddv_spark.operators.retrieval import bm25_topk, rrf_fuse
    from mallarddv_spark.operators.similarity import cosine_topk_bruteforce
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = literal_frame(spark, QUERIES, "query_id string, query string")
    bm = bm25_topk(docs, queries, k=20)
    qv = emb.filter("vec_id < 3").select(
        F.expr("CASE vec_id WHEN 0 THEN 'q_hash' WHEN 1 THEN 'q_sort' "
               "ELSE 'q_dup' END").alias("vec_id"),
        "embedding",
    )
    cos = cosine_topk_bruteforce(qv, emb, k=20).select(
        F.col("query_id"), F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("rnk"),
    )
    fused = rrf_fuse([bm, cos], k=10).orderBy("query_id", "rnk")
    got = [(r.query_id, r.doc_id, r.n_runs, r.rrf_score, r.rnk)
           for r in fused.collect()]

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')")
    vals = ", ".join(f"('{q}', '{t}')" for q, t in QUERIES)
    bm_sql = DUCK_BM25.format(queries=vals, k=20)
    want = [tuple(r) for r in con.sql(
        "WITH bm AS (" + bm_sql + """),
        qv AS (SELECT CASE vec_id WHEN 0 THEN 'q_hash' WHEN 1 THEN 'q_sort'
                      ELSE 'q_dup' END AS query_id,
                      embedding::DOUBLE[] AS v
               FROM embeddings WHERE vec_id < 3),
        cv AS (SELECT vec_id AS doc_id, embedding::DOUBLE[] AS v FROM embeddings),
        cosr AS (
          SELECT query_id, doc_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY
                   round(list_dot_product(qv.v, cv.v)
                         / (sqrt(list_dot_product(qv.v, qv.v))
                            * sqrt(list_dot_product(cv.v, cv.v))), 6) DESC,
                   doc_id) AS rnk
          FROM qv CROSS JOIN cv QUALIFY rnk <= 20),
        uni AS (
          SELECT query_id, doc_id, round(1e10 / (60 + rnk))::BIGINT AS c10
          FROM bm
          UNION ALL
          SELECT query_id, doc_id, round(1e10 / (60 + rnk))::BIGINT FROM cosr),
        agg AS (
          SELECT query_id, doc_id, count(*)::BIGINT AS n_runs,
                 sum(c10)::BIGINT AS s10
          FROM uni GROUP BY 1, 2)
        SELECT query_id, doc_id, n_runs, round(s10 / 1e10, 6) AS rrf_score,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY s10 DESC, doc_id) AS rnk
        FROM agg QUALIFY rnk <= 10 ORDER BY query_id, rnk
        """).fetchall()]
    assert got == want
