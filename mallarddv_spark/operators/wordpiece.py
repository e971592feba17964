"""WordPiece tokenizer training and encoding (Schuster & Nakajima 2012;
the BERT formulation, Devlin et al. 2019), relationally.

Reference scope note: the reference engine has no tokenizer stage —
this completes the training-data pipeline's tokenizer triad (BPE in
``operators/bpe.py``, unigram-LM in ``operators/unigram.py``, WordPiece
here), so a corpus curated by this engine can be token-counted under
any of the three dominant subword schemes.

WordPiece differs from BPE in exactly two places, and both stay
relational:

* **training** picks the adjacent pair maximizing the LIKELIHOOD score
  ``count(ab) / (count(a) * count(b))`` — the pair whose merge most
  increases a unigram LM's corpus likelihood — instead of the raw pair
  count. Per round that is the same explode + groupBy pair table as
  BPE plus one symbol-count groupBy, both over the WORD table (rows ∝
  vocabulary, never the corpus; the fastBPE insight mapped to
  DataFrames — see ``operators/bpe.py``).
* **encoding** is greedy longest-match-first over the final vocabulary
  (NOT a merge replay): repeatedly take the longest vocab piece that
  prefixes the remainder, with non-initial pieces carrying the ``##``
  continuation marker; a word with no full cover becomes the single
  ``[UNK]`` token (BERT's behavior). The whole match loop is ONE fold
  expression per word with the vocabulary in a single broadcast map
  cell — the :func:`unigram.unigram_encode_words` shape: zero Python,
  zero shuffles in the lattice, cost ∝ distinct words.

Determinism: score ties break on the pair ``(a, b)`` lexicographically;
both the trainer and its pure-Python differential reference
(``tests/test_wordpiece.py``) compute the score as the same IEEE
double, so training is a pure function of corpus content regardless of
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mallarddv_spark.exceptions import DVConfigurationError
from mallarddv_spark.operators.bpe import word_frequencies

__all__ = [
    "train_wordpiece", "wordpiece_encode_words", "wordpiece_encode",
    "save_wordpiece", "load_wordpiece",
]

CONT = "##"
UNK = "[UNK]"


def _initial_wp_symbols(word_col: str = "word"):
    # per-character split with the continuation marker on every
    # non-initial symbol: "low" -> ["l", "##o", "##w"]
    return F.expr(
        f"transform(sequence(1, length({word_col})), i -> "
        f"IF(i = 1, substring({word_col}, i, 1), "
        f"concat('{CONT}', substring({word_col}, i, 1))))"
    )


def _wp_product(a: str, b: str) -> str:
    """The merged symbol: ``b``'s continuation marker is swallowed
    (``"##o" + "##w" -> "##ow"``; ``"l" + "##o" -> "lo"``)."""
    return a + (b[len(CONT):] if b.startswith(CONT) else b)


def _wp_merge_expr(sym_col: str, a_col, b_col, prod_col):
    """Greedy left-to-right merge of adjacent (a, b) into the marker-
    aware product — one fold, no UDF (the ``bpe._merge_expr`` shape,
    with the product passed in rather than concatenated, because the
    ``##`` swallow makes product != a || b)."""
    return F.expr(
        f"aggregate({sym_col}, cast(array() as array<string>), (acc, x) -> "
        f"IF(size(acc) > 0 AND element_at(acc, -1) = {a_col} AND x = {b_col}, "
        f"concat(slice(acc, 1, size(acc) - 1), array({prod_col})), "
        f"concat(acc, array(x))))"
    )


def train_wordpiece(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 50,
    lowercase: bool = True,
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> dict:
    """Learn a WordPiece vocabulary from a corpus. Returns
    ``{"vocab": [piece, ...], "lowercase": bool}`` where ``vocab`` is
    the initial alphabet (every word-initial char and every ``##``-
    marked continuation char actually seen, lexicographic) followed by
    the ``num_merges`` merge products in learned order. Training stops
    early when no adjacent pair reaches ``min_pair_count``.

    Each round: one pair-count groupBy and one symbol-count groupBy
    over the word-frequency table (vocabulary-sized), an argmax on
    ``pair_cnt / (cnt_a * cnt_b)`` (driver-side single row — bounded
    metadata), and one fold-expression rewrite of the symbol arrays.
    Rounds are sequential by design — unlike raw-count BPE, a merge
    changes the DENOMINATOR of every pair sharing a symbol with it, so
    there is no provably-safe batch rule; at a realistic 32k-vocab
    budget drive the schedule from a sampled sub-corpus or accept the
    per-round job cost (the ``operators/bpe.py`` batching analysis and
    its measured table cover the trade-off).

    ``▁``-style end-of-word markers are not used — WordPiece marks
    continuations (``##``) instead of endings, so raw text containing
    a literal ``##`` INSIDE a word would alias a continuation piece;
    strip or remap it upstream (the same contract every marker-based
    tokenizer carries).
    """
    if num_merges < 1:
        raise DVConfigurationError("train_wordpiece: num_merges must be >= 1")
    words = (
        word_frequencies(df, text_col, lowercase)
        .select("cnt", _initial_wp_symbols().alias("syms"))
        .localCheckpoint(eager=True)
    )
    alphabet = [
        r.s
        for r in words.select(F.explode("syms").alias("s"))
        .distinct()
        .orderBy("s")
        .collect()
    ]
    merges: list[str] = []
    since_ckpt = 0
    for _ in range(num_merges):
        sym_counts = (
            words.select("cnt", F.explode("syms").alias("s"))
            .groupBy("s")
            .agg(F.sum("cnt").alias("sc"))
        )
        pairs = (
            words.filter(F.size("syms") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), j -> "
                        "struct(element_at(syms, j) as a, "
                        "element_at(syms, j + 1) as b))"
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
        )
        top = (
            pairs.filter(F.col("n") >= int(min_pair_count))
            .join(
                sym_counts.select(F.col("s").alias("a"), F.col("sc").alias("ca")),
                "a",
            )
            .join(
                sym_counts.select(F.col("s").alias("b"), F.col("sc").alias("cb")),
                "b",
            )
            .withColumn(
                "score",
                F.col("n").cast("double")
                / (F.col("ca").cast("double") * F.col("cb").cast("double")),
            )
            .orderBy(F.col("score").desc(), F.col("a").asc(), F.col("b").asc())
            .take(1)
        )
        if not top:
            break
        a, b = top[0].a, top[0].b
        prod = _wp_product(a, b)
        merges.append(prod)
        words = words.select(
            "cnt",
            F.lit(a).alias("__ma"),
            F.lit(b).alias("__mb"),
            F.lit(prod).alias("__mp"),
            "syms",
        ).select(
            "cnt", _wp_merge_expr("syms", "__ma", "__mb", "__mp").alias("syms")
        )
        since_ckpt += 1
        if since_ckpt >= checkpoint_every:
            words = words.localCheckpoint(eager=True)
            since_ckpt = 0
    return {"vocab": alphabet + merges, "lowercase": lowercase}


def _wp_greedy_expr(word_col: str) -> str:
    # greedy longest-match-first cover of the word: state struct
    # (pos, ps, bad); each outer step consumes >= 1 char or fails the
    # word, so length(word) steps always suffice. The inner fold scans
    # candidate lengths ascending and keeps the LAST (longest) vocab
    # hit — its default value has bad = true, so "no prefix matches"
    # and "word failed" are the same state. Lookup keys carry the
    # continuation marker exactly as stored in the vocabulary.
    key = (
        f"IF(st.pos = 0, substr({word_col}, 1, l), "
        f"concat('{CONT}', substr({word_col}, st.pos + 1, l)))"
    )
    step = (
        f"aggregate(sequence(1, length({word_col}) - st.pos), "
        f"struct(st.pos as pos, st.ps as ps, true as bad), "
        f"(best, l) -> IF(element_at(__vmap, {key}) IS NOT NULL, "
        f"struct(st.pos + l as pos, st.ps || array({key}) as ps, "
        f"false as bad), best))"
    )
    return (
        f"aggregate(sequence(1, length({word_col})), "
        f"struct(0 as pos, cast(array() as array<string>) as ps, "
        f"false as bad), "
        f"(st, _) -> CASE WHEN st.bad OR st.pos >= length({word_col}) "
        f"THEN st ELSE {step} END)"
    )


def wordpiece_encode_words(
    words: DataFrame,
    model: dict,
    word_col: str = "word",
    max_input_chars_per_word: int = 100,
) -> DataFrame:
    """Greedy longest-match segmentation of a table of distinct words
    under a WordPiece vocabulary: ``({word_col}, tokens array<string>)``.
    Words with no full vocabulary cover — or longer than
    ``max_input_chars_per_word`` (BERT caps at 200; the cap bounds the
    O(len²) prefix scans on pathological "words": URLs, base64 blobs) —
    become ``[UNK]``.

    The vocabulary broadcasts as ONE ``map<piece, 1>`` cell and the
    whole match loop is a fold expression inside codegen — zero Python,
    zero shuffles; cost ∝ distinct words, never the corpus (the
    :func:`unigram.unigram_encode_words` shape).
    """
    from mallarddv_spark.functions.litframe import scalar_map_cell

    spark = words.sparkSession
    vmap = scalar_map_cell(
        spark, [(p, 1) for p in model["vocab"]], "string", "int", "__vmap"
    )
    walk = _wp_greedy_expr(word_col)
    return (
        words.select(word_col)
        .filter(F.length(word_col) > 0)
        .crossJoin(F.broadcast(vmap))
        .withColumn(
            "__st",
            F.when(
                F.length(word_col) <= F.lit(int(max_input_chars_per_word)),
                F.expr(walk),
            ),
        )
        .select(
            word_col,
            F.when(
                F.col("__st").isNotNull() & ~F.col("__st.bad"),
                F.col("__st.ps"),
            )
            .otherwise(F.array(F.lit(UNK)))
            .alias("tokens"),
        )
    )


def wordpiece_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: dict,
    max_input_chars_per_word: int = 100,
    stream: DataFrame | None = None,
) -> DataFrame:
    """Tokenize a corpus under a trained WordPiece model:
    ``(id, n_words, n_tokens, n_unk, tokens)`` — the
    :func:`bpe.bpe_encode` corpus shape plus the document's ``[UNK]``
    count (the standard OOV-rate quality signal a WordPiece run is
    monitored by).

    The greedy matcher runs on the corpus's DISTINCT words only; the
    corpus pays one posexplode + one join against that word→tokens map
    (AQE broadcasts it when vocabulary-small). Documents with no
    tokens have no row — the module's no-evidence convention.

    ``stream`` supplies a pre-built ``(id, pos, word)`` frame from
    :func:`~mallarddv_spark.operators.bpe.whitespace_word_stream` built
    with the MODEL'S case convention — the multi-tokenizer fusion path
    (one corpus explode shared across encoders).
    """
    if stream is None:
        from mallarddv_spark.operators.bpe import whitespace_word_stream

        stream = whitespace_word_stream(
            df, id_col, text_col,
            lowercase=model.get("lowercase", True),
        )
    seg = wordpiece_encode_words(
        stream.select("word").distinct(), model,
        max_input_chars_per_word=max_input_chars_per_word,
    )
    return (
        stream.join(seg, "word")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum(F.size("tokens")).cast("bigint").alias("n_tokens"),
            F.sum(
                F.size(F.filter("tokens", lambda x: x == F.lit(UNK)))
            ).cast("bigint").alias("n_unk"),
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("tokens")))
                ).getField("tokens")
            ).alias("tokens"),
        )
    )


def save_wordpiece(spark, model: dict, path: str) -> None:
    """Persist a trained model: ``{path}/vocab`` parquet (rank-ordered)
    plus a one-row ``{path}/params`` written LAST — its presence marks
    the model complete (the ``save_bpe`` completeness-marker
    convention)."""
    from mallarddv_spark.functions.litframe import literal_frame

    # createDataFrame, NOT literal_frame: the vocab is vocabulary-sized
    # (a realistic model is tens of thousands of rows; literal analysis
    # is quadratic driver-side — the save_bpe lesson)
    rows = [(i, p) for i, p in enumerate(model["vocab"])]
    spark.createDataFrame(
        rows or [(None, None)], "rank int, piece string"
    ).filter(F.col("rank").isNotNull()).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/vocab")
    literal_frame(
        spark, [(bool(model.get("lowercase", True)),)], "lowercase boolean"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")


def load_wordpiece(spark, path: str) -> dict:
    """Load a model persisted by :func:`save_wordpiece`."""
    p = spark.read.parquet(f"{path}/params").first()
    vocab = [
        r.piece
        for r in spark.read.parquet(f"{path}/vocab").orderBy("rank").collect()
    ]
    return {"vocab": vocab, "lowercase": bool(p.lowercase)}
