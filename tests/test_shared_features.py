"""Round-14 optimization plumbing: the precomputed-input hooks added so
one materialized subtree can feed several consumers (`dsir_importance
features=/target_features=`, `train_nb_classifier gram_counts=`,
`nb_classify features=`, `vocab_topk vocab=`) must produce results
IDENTICAL to the self-computing paths — they are pure sharing hooks,
not semantic switches."""

from pyspark.sql import functions as F

from mallarddv_spark.operators.curation import (
    dsir_importance,
    hashed_ngram_features,
    nb_classify,
    train_nb_classifier,
    vocab_topk,
    vocabulary,
)

DOCS = [
    (0, "en", "src0", "the quick brown fox jumps over the lazy dog"),
    (1, "en", "src1", "pack my box with five dozen liquor jugs"),
    (2, "de", "src0", "der schnelle braune fuchs springt"),
    (3, "de", "src1", "der faule hund schlaeft den ganzen tag"),
    (4, "en", "src1", "the dog and the fox are friends"),
    (5, "de", "src0", "fuchs und hund sind freunde der nacht"),
    (6, "en", "src1", ""),
    (7, "de", "src1", "hund hund hund fuchs"),
]


def _docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id bigint, lang string, source string, text string"
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_dsir_features_injection_identical(spark):
    d = _docs(spark)
    tgt = d.filter(F.col("source") == "src0")
    base = dsir_importance(d, tgt, "doc_id", "text", buckets=256)
    feats = hashed_ngram_features(d, "doc_id", "text", buckets=256)
    tfe = hashed_ngram_features(tgt, "doc_id", "text", buckets=256)
    inj = dsir_importance(
        d, tgt, "doc_id", "text", buckets=256,
        features=feats, target_features=tfe,
    )
    assert _rows(base) == _rows(inj)


def test_nb_gram_counts_and_features_injection_identical(spark):
    d = _docs(spark)
    train = d.filter(F.pmod("doc_id", F.lit(2)) == 0)
    test = d.filter(F.pmod("doc_id", F.lit(2)) == 1)
    nb_a = train_nb_classifier(train, "lang", "text", buckets=128)
    out_a = nb_classify(test, "doc_id", "text", nb_a)

    feats = hashed_ngram_features(d, "doc_id", "text", buckets=128)
    feats = feats.join(d.select("doc_id", "lang"), "doc_id")
    gram_counts = (
        feats.filter(
            (F.pmod("doc_id", F.lit(2)) == 0) & F.col("lang").isNotNull()
        )
        .groupBy(F.col("lang").alias("label"), "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    nb_b = train_nb_classifier(
        train, "lang", "text", buckets=128, gram_counts=gram_counts
    )
    out_b = nb_classify(
        test, "doc_id", "text", nb_b,
        features=feats.filter(F.pmod("doc_id", F.lit(2)) == 1).select(
            "doc_id", "bucket", "cnt"
        ),
    )
    assert _rows(out_a) == _rows(out_b)


def test_vocab_topk_injection_identical(spark):
    d = _docs(spark)
    base = vocab_topk(d, "text", k=5)
    inj = vocab_topk(d, "text", k=5, vocab=vocabulary(d, "text"))
    assert _rows(base) == _rows(inj)


def test_bm25_index_postings_injection_identical(spark, tmp_path):
    """build_bm25_index/bm25_index_append with postings= (the round-14
    sharing hook) must store byte-identical postings AND totals vs the
    self-tokenizing path — probe results and stored params both match."""
    from mallarddv_spark.operators.retrieval import (
        bm25_index_append,
        bm25_index_probe,
        build_bm25_index,
        build_postings,
    )

    d = _docs(spark)
    even = d.filter("doc_id % 2 = 0")
    odd = d.filter("doc_id % 2 = 1")
    q = spark.createDataFrame(
        [("q1", "fox dog"), ("q2", "hund der")],
        "query_id string, query string",
    )

    p_a = str(tmp_path / "idx_a")
    build_bm25_index(even, p_a, term_buckets=4)
    bm25_index_append(odd, p_a)

    shared = build_postings(d)
    p_b = str(tmp_path / "idx_b")
    build_bm25_index(
        even, p_b, term_buckets=4,
        postings=shared.filter("doc_id % 2 = 0"),
    )
    bm25_index_append(odd, p_b, postings=shared.filter("doc_id % 2 = 1"))

    pa = spark.read.parquet(f"{p_a}/params").first().asDict()
    pb = spark.read.parquet(f"{p_b}/params").first().asDict()
    assert pa == pb
    assert _rows(spark.read.parquet(f"{p_a}/postings")) == _rows(
        spark.read.parquet(f"{p_b}/postings")
    )
    assert _rows(bm25_index_probe(spark, p_a, q, k=5)) == _rows(
        bm25_index_probe(spark, p_b, q, k=5)
    )


def test_pair_counts_injection_identical(spark):
    """ngram_jaccard_pairs/containment_pairs with pair_counts= (the
    round-14 sharing hook: one candidate materialization feeds both
    scorers) must equal the self-computing paths row for row."""
    from mallarddv_spark.operators.dedup import (
        _shingle_pair_counts,
        containment_pairs,
        ngram_jaccard_pairs,
    )

    rows = [
        (0, "a b c d e f g"),
        (1, "a b c d e f h"),
        (2, "a b c d e f g"),
        (3, "x y z w v u t"),
        (4, "a b c x y z w v u t s r q"),
    ]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    pc = _shingle_pair_counts(d, "doc_id", "text", 3, 1000)
    for fn, kw in (
        (ngram_jaccard_pairs, dict(threshold=0.2)),
        (containment_pairs, dict(threshold=0.2)),
    ):
        base = fn(d, "doc_id", "text", shingle_size=3,
                  max_shingle_df=1000, **kw)
        inj = fn(d, "doc_id", "text", shingle_size=3,
                 max_shingle_df=1000, pair_counts=pc, **kw)
        assert _rows(base) == _rows(inj)
        assert len(_rows(base)) > 0


def test_minhash_shingles_injection_identical(spark):
    """minhash_lsh_pairs with shingles= (one materialized shingle
    explode feeding the signature stage and all three rerank consumers)
    must equal the self-computing path row for row — in both hash modes
    and with the max_shingle_df cut applied on top of the injection."""
    from mallarddv_spark.operators.dedup import _shingles, minhash_lsh_pairs

    rows = [
        (0, "a b c d e f g h i j"),
        (1, "a b c d e f g h i k"),
        (2, "a b c d e f g h i j"),
        (3, "x y z w v u t s r q"),
        (4, "x y z w v u t s r p"),
    ]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    sh = _shingles(d, "doc_id", "text", 3).localCheckpoint(eager=True)
    for hm in ("md5", "xxhash64"):
        for cut in (None, 1000):
            base = minhash_lsh_pairs(
                d, "doc_id", "text", num_perm=32, bands=16,
                threshold=0.30, hash_mode=hm, max_shingle_df=cut,
            )
            inj = minhash_lsh_pairs(
                d, "doc_id", "text", num_perm=32, bands=16,
                threshold=0.30, hash_mode=hm, max_shingle_df=cut,
                shingles=sh,
            )
            assert _rows(base) == _rows(inj)
            assert len(_rows(base)) > 0


def test_enc3_fused_gates_identical(spark):
    """suite._enc3_cols (the round-15 fusion: ONE distinct-word frame +
    ONE stream join + ONE per-doc groupBy for all three whitespace-mode
    tokenizer encode gates) must equal the three single-encoder gate
    frames column for column — including zero-word docs (coalesce
    defaults) and the unigram grid arithmetic."""
    from mallarddv_spark import suite
    from mallarddv_spark.operators.bpe import whitespace_word_stream

    rows = [
        (0, "the sand and the sea in the morning"),
        (1, "a stone on the strand near the end"),
        (2, ""),                          # zero-word doc: coalesce path
        (3, "   "),                       # whitespace-only: same
        (4, "jjj qqq vvv kkk"),           # [UNK]/unk-floor exercising
        (5, "the the the and and in on er st re ed ng nd he th an"),
    ]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    stream = whitespace_word_stream(
        d, "doc_id", "text", lowercase=True
    ).localCheckpoint(eager=True)

    fused = suite._enc3_cols(spark, d, stream)
    ref = (
        suite._bpe_enc_cols(d, stream)
        .join(suite._wp_enc_cols(d, stream), "doc_id")
        .join(suite._un_enc_cols(spark, d, stream), "doc_id")
    )
    assert fused.schema == ref.select(*fused.columns).schema
    assert _rows(fused) == _rows(ref.select(*fused.columns))
    assert len(_rows(fused)) == len(rows)
