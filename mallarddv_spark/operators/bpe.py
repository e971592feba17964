"""Byte-pair-encoding tokenizer training and encoding (Sennrich et al.
2016), relationally.

Reference scope note: the reference engine has no tokenizer stage —
this extends the training-data pipeline tier (a pretraining corpus
needs a tokenizer trained ON it, and token counts under that tokenizer
drive every mixing/packing decision upstream of a run).

The scale insight is the classic one from fastBPE/HuggingFace, mapped
to DataFrames: after ONE corpus pass that builds the word-frequency
table, both training and encoding operate on the VOCABULARY (≤ a few
million rows for natural language at any corpus size), never the
corpus again:

* **train** — each merge round counts adjacent symbol pairs over the
  words table weighted by word frequency (explode + groupBy on rows ∝
  vocabulary), picks the argmax (driver-side single row — bounded
  metadata, not data), and rewrites the symbol arrays with a greedy
  left-to-right fold expression. ``num_merges`` rounds = ``num_merges``
  small jobs; lineage is cut with localCheckpoint every few rounds so
  the plan never grows unboundedly (the connected-components pattern,
  ``operators/graph.py``).
* **encode** — the merge list replays over the DISTINCT words of the
  target corpus (rows ∝ vocabulary), then the word→tokens map joins
  back to the corpus on the word key. The corpus pays one explode and
  one join; with AQE the map side broadcasts when small.

Ties in pair counts break lexicographically on the pair itself, so
training is deterministic for a given corpus regardless of
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mallarddv_spark.exceptions import DVConfigurationError

__all__ = [
    "word_frequencies", "train_bpe", "bpe_encode_words", "bpe_encode",
    "save_bpe", "load_bpe",
]

# end-of-word marker: distinguishes "low</w>" (word-final) from "low" as
# a prefix of "lower" — the standard Sennrich formulation
EOW = "▁"


def word_frequencies(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """The ONE corpus pass: whitespace words and their counts
    ``(word, cnt)``. Everything downstream operates on this table."""
    t = F.trim(F.col(text_col))
    if lowercase:
        t = F.lower(t)
    return (
        df.select(F.explode(F.split(t, r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _initial_symbols(word_col: str = "word"):
    # per-character split with the end-of-word marker appended to the
    # last symbol: "low" -> ["l", "o", "w▁"]
    return F.expr(
        f"transform(sequence(1, length({word_col})), i -> "
        f"IF(i = length({word_col}), "
        f"concat(substring({word_col}, i, 1), '{EOW}'), "
        f"substring({word_col}, i, 1)))"
    )


def _merge_expr(sym_col: str, a_col, b_col):
    """Greedy left-to-right merge of adjacent (a, b) into ab — one fold,
    no UDF. "a a a" + (a,a) -> ["aa", "a"], because the merged token no
    longer equals a bare "a"."""
    return F.expr(
        f"aggregate({sym_col}, cast(array() as array<string>), (acc, x) -> "
        f"IF(size(acc) > 0 AND element_at(acc, -1) = {a_col} AND x = {b_col}, "
        f"concat(slice(acc, 1, size(acc) - 1), array(concat({a_col}, {b_col}))), "
        f"concat(acc, array(x))))"
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 50,
    lowercase: bool = True,
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> dict:
    """Learn ``num_merges`` BPE merges from a corpus. Returns
    ``{"merges": [(a, b), ...] in rank order, "lowercase": bool}``;
    training stops early when no adjacent pair reaches
    ``min_pair_count`` (merging singletons memorizes the corpus).

    Determinism: the argmax pair breaks count ties on (a, b)
    lexicographically — a pure function of the corpus content.

    The end-of-word marker ``▁`` (U+2581, the sentencepiece convention)
    is RESERVED: a corpus containing it in raw text would make word
    boundaries ambiguous at decode time — strip or remap it upstream
    (the same contract every marker-based tokenizer carries).
    """
    if num_merges < 1:
        raise DVConfigurationError("train_bpe: num_merges must be >= 1")
    words = (
        word_frequencies(df, text_col, lowercase)
        .select("cnt", _initial_symbols().alias("syms"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    for i in range(num_merges):
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
        best = pairs.orderBy(
            F.col("n").desc(), F.col("a").asc(), F.col("b").asc()
        ).first()
        if best is None or best.n < min_pair_count:
            break
        merges.append((best.a, best.b))
        words = words.select(
            "cnt",
            F.lit(best.a).alias("__ma"),
            F.lit(best.b).alias("__mb"),
            "syms",
        ).select("cnt", _merge_expr("syms", "__ma", "__mb").alias("syms"))
        if (i + 1) % checkpoint_every == 0:
            words = words.localCheckpoint(eager=True)
    return {"merges": merges, "lowercase": lowercase}


def bpe_encode_words(words: DataFrame, bpe: dict, word_col: str = "word",
                     checkpoint_every: int = 8) -> DataFrame:
    """Replay the learned merges, in rank order, over a table of distinct
    words: ``(word, tokens array<string>)``. Cost ∝ vocabulary."""
    out = words.select(word_col, _initial_symbols(word_col).alias("tokens"))
    for i, (a, b) in enumerate(bpe["merges"]):
        out = out.select(
            word_col,
            F.lit(a).alias("__ma"),
            F.lit(b).alias("__mb"),
            "tokens",
        ).select(word_col, _merge_expr("tokens", "__ma", "__mb").alias("tokens"))
        if (i + 1) % checkpoint_every == 0:
            out = out.localCheckpoint(eager=True)
    return out


def save_bpe(spark, bpe: dict, path: str) -> None:
    """Persist a trained model: ``{path}/merges`` parquet (rank-ordered)
    plus a one-row ``{path}/params`` written LAST — its presence marks
    the model complete (the same completeness-marker convention as the
    NB classifier and the training-shard manifest)."""
    from mallarddv_spark.functions.litframe import literal_frame

    rows = [(i, a, b) for i, (a, b) in enumerate(bpe["merges"])]
    literal_frame(
        spark, rows or [(None, None, None)], "rank int, a string, b string"
    ).filter(F.col("rank").isNotNull()).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/merges")
    literal_frame(
        spark, [(bool(bpe.get("lowercase", True)),)], "lowercase boolean"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")


def load_bpe(spark, path: str) -> dict:
    """Load a model persisted by :func:`save_bpe`."""
    p = spark.read.parquet(f"{path}/params").first()
    merges = [
        (r.a, r.b)
        for r in spark.read.parquet(f"{path}/merges").orderBy("rank").collect()
    ]
    return {"merges": merges, "lowercase": bool(p.lowercase)}


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bpe: dict,
) -> DataFrame:
    """Tokenize a corpus under a trained BPE model:
    ``(id, n_words, n_tokens, tokens)`` with ``tokens`` the per-document
    token sequence (word tokens concatenated in order).

    The merge replay runs on the corpus's DISTINCT words only; the
    corpus itself pays one explode (with position, to restore order) and
    one join against that word→tokens map — at 100 TB the map is the
    small side (natural-language vocabulary), so AQE broadcasts it.

    Documents with no tokens (empty/whitespace text) have no row in the
    output — the same no-evidence convention as
    ``textops.score_bigram_logprob``.
    """
    t = F.trim(F.col(text_col))
    if bpe.get("lowercase", True):
        t = F.lower(t)
    stream = (
        df.select(F.col(id_col), F.posexplode(F.split(t, r"\s+")))
        .withColumnRenamed("col", "word")
        .filter(F.col("word") != "")
    )
    vocab = bpe_encode_words(stream.select("word").distinct(), bpe)
    return (
        stream.join(vocab, "word")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum(F.size("tokens")).cast("bigint").alias("n_tokens"),
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("tokens")))
                ).getField("tokens")
            ).alias("tokens"),
        )
    )
