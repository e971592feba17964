"""Unigram-LM (SentencePiece-style) subword tokenization: a seed
vocabulary from frequent substrings and a Viterbi encoder, both
relational and corpus-size independent.

Reference scope note: the reference engine has no tokenizer tier —
this extends the training-data pipeline family alongside
:mod:`mallarddv_spark.operators.bpe`. Kudo 2018 ("Subword
Regularization") trains a unigram LM over substring pieces by EM and
encodes with Viterbi; at 100 TB the operation that actually touches
the lake is the ENCODE — a fixed vocabulary applied to every document
— so that is the piece built to scale here:

* the corpus pays one ``posexplode`` + one join: every DISTINCT word
  is Viterbi-segmented exactly once (``unigram_encode_words``), and
  the word→pieces map joins back (vocabulary-sized — AQE broadcasts
  it). The same shape as :func:`bpe.bpe_encode`.
* the per-word Viterbi DP is ONE Catalyst fold expression — the piece
  vocabulary rides as a single broadcast map cell (``map<piece,
  logp>``; ~MBs at a 100k vocabulary), and the O(L²) lattice per word
  runs inside codegen with zero Python and zero extra jobs.
* the seed vocabulary (:func:`unigram_seed_vocab`) is the standard
  frequent-substring seeding of the EM trainer: one groupBy over the
  exploded substring stream of the WORD table (vocabulary-sized, never
  the corpus). Full EM refinement is deliberately out of scope — the
  seed + Viterbi pair is deterministic and self-contained; a
  SentencePiece-trained vocabulary loads into the same encoder as
  ``(piece, logp)`` rows.

Determinism: Viterbi ties prefer the longer piece, then leftmost split
(strict ``>`` over ascending split points); per-word scores evaluate
in a fixed order inside one expression, and document log-probs sum
per-word scores on the 1e-10 integer grid — the module-wide replay
discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mallarddv_spark.exceptions import DVConfigurationError

__all__ = [
    "unigram_seed_vocab",
    "unigram_encode_words",
    "unigram_encode",
]


def unigram_seed_vocab(
    df: DataFrame,
    text_col: str,
    max_piece_len: int = 8,
    top_k: int = 8192,
    lowercase: bool = True,
) -> DataFrame:
    """Seed piece vocabulary ``(piece, logp)`` from substring
    frequencies — the initialization step of the unigram-LM trainer
    (Kudo 2018 seeds EM with the most frequent substrings; without the
    EM refinement this is already a usable deterministic vocabulary,
    and a SentencePiece-trained one drops into the same encoder).

    Every substring of length 1..``max_piece_len`` of every word is
    counted weighted by the word's corpus frequency;
    the ``top_k`` pieces by count (ties: piece ascending) are kept, all
    single characters are force-included (so every word stays
    segmentable), and ``logp = ln(cnt / total_kept)`` normalizes over
    the kept set.

    Scale shape: one corpus pass builds the word-frequency table
    (groupBy, map-side combine); the substring explosion runs over the
    WORD table — ``O(vocab · word_len · max_piece_len)`` rows, corpus-size
    independent — into one more groupBy. The top-k cut is a
    TakeOrderedAndProject (constant k, no full sort)."""
    if int(max_piece_len) < 1:
        raise DVConfigurationError(
            "unigram_seed_vocab: max_piece_len must be >= 1"
        )
    if int(top_k) < 1:
        raise DVConfigurationError("unigram_seed_vocab: top_k must be >= 1")
    t = F.trim(F.col(text_col))
    if lowercase:
        t = F.lower(t)
    words = (
        df.select(F.explode(F.split(t, r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("wcnt"))
    )
    # all substrings (start i, length l) of each word, weight = word count
    subs = words.select(
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, length(word)), i -> "
                f"transform(sequence(1, least({int(max_piece_len)}, "
                f"length(word) - i + 1)), l -> substr(word, i, l))))"
            )
        ).alias("piece"),
        "wcnt",
    )
    counts = subs.groupBy("piece").agg(F.sum("wcnt").alias("cnt"))
    top = (
        counts.orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(int(top_k))
    )
    chars = counts.filter(F.length("piece") == 1)
    kept = top.unionByName(chars).groupBy("piece").agg(
        F.max("cnt").alias("cnt")
    )
    total = kept.agg(F.sum("cnt")).first()[0] or 1
    return kept.select(
        "piece",
        F.round(
            F.log(F.col("cnt").cast("double") / F.lit(float(total))), 10
        ).alias("logp"),
    )


def _viterbi_expr(word_col: str, unk: str) -> str:
    # alpha array: element_at(.., p + 1) = best (score, backpointer) for
    # a prefix of length p; __lp(i, j) = logp of the piece spanning
    # 0-based char positions i..j-1, with the single-char unk floor
    lp = (
        f"coalesce(element_at(__vmap, substr({word_col}, i + 1, j - i)), "
        f"CASE WHEN j - i = 1 THEN {unk} END)"
    )
    step = (
        f"aggregate(sequence(0, j - 1), "
        f"struct(cast(-1e30 as double) as s, -1 as b), "
        f"(best, i) -> CASE WHEN element_at(acc, i + 1).s > cast(-1e29 as "
        f"double) AND {lp} IS NOT NULL AND element_at(acc, i + 1).s + {lp} "
        f"> best.s THEN struct(element_at(acc, i + 1).s + {lp} as s, i as b) "
        f"ELSE best END)"
    )
    return (
        f"aggregate(sequence(1, length({word_col})), "
        f"array(struct(cast(0.0 as double) as s, -1 as b)), "
        f"(acc, j) -> acc || array({step}))"
    )


def unigram_encode_words(
    words: DataFrame,
    vocab: DataFrame,
    word_col: str = "word",
    unk_logp: float | None = -20.0,
) -> DataFrame:
    """Viterbi-segment a table of distinct words under a ``(piece,
    logp)`` vocabulary: ``({word_col}, pieces array<string>, score)``
    with ``score`` the word's best segmentation log-prob (6 dp).

    ``unk_logp`` floors single characters absent from the vocabulary so
    every word segments; pass ``None`` for strict mode, where a word no
    piece sequence covers gets ``pieces = NULL, score = NULL`` (the
    caller decides — drop, quarantine, or re-seed the vocabulary).

    The whole lattice runs in ONE expression per word: the vocabulary
    broadcasts as a single ``map<piece, logp>`` cell (fine to ~10^5–10^6
    pieces — megabytes; beyond that, shard the encode by piece-length
    tiers), and the O(len²) DP + backtrack execute inside codegen —
    zero Python, zero per-word jobs, cost ∝ vocabulary of the corpus,
    not the corpus. Ties prefer the longer piece, then the leftmost
    split — fully deterministic."""
    unk = "cast(null as double)" if unk_logp is None else repr(float(unk_logp))
    vmap = vocab.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("piece"), F.col("logp")))
        ).alias("__vmap")
    )
    alphas = _viterbi_expr(word_col, unk)
    # backtrack: walk backpointers from the full-word position; at most
    # length(word) hops. Unreachable words (score sentinel) yield NULL.
    bt = (
        f"aggregate(sequence(1, length({word_col})), "
        f"struct(length({word_col}) as pos, "
        f"cast(array() as array<string>) as ps), "
        f"(st, _) -> CASE WHEN st.pos > 0 THEN struct("
        f"element_at(__alphas, st.pos + 1).b as pos, "
        f"array(substr({word_col}, element_at(__alphas, st.pos + 1).b + 1, "
        f"st.pos - element_at(__alphas, st.pos + 1).b)) || st.ps as ps) "
        f"ELSE st END).ps"
    )
    final = f"element_at(__alphas, length({word_col}) + 1).s"
    return (
        words.select(word_col)
        .filter(F.length(word_col) > 0)
        .crossJoin(F.broadcast(vmap))
        .withColumn("__alphas", F.expr(alphas))
        .select(
            word_col,
            F.when(
                F.expr(final) > F.lit(-1e29), F.expr(bt)
            ).alias("pieces"),
            F.when(
                F.expr(final) > F.lit(-1e29),
                F.round(F.expr(final), 6),
            ).alias("score"),
        )
    )


def unigram_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame,
    lowercase: bool = True,
    unk_logp: float = -20.0,
) -> DataFrame:
    """Tokenize a corpus under a unigram-LM vocabulary:
    ``(id, n_words, n_tokens, logprob, tokens)`` — the
    :func:`bpe.bpe_encode` corpus shape plus the document's summed
    Viterbi log-prob (per-word scores snapped to the 1e-10 integer
    grid before summing, so the doc score is partition-order
    independent).

    The corpus pays one ``posexplode`` + one join against the
    distinct-word segmentation (vocabulary-sized — AQE broadcasts it);
    documents with no tokens have no row (the module's no-evidence
    convention)."""
    t = F.trim(F.col(text_col))
    if lowercase:
        t = F.lower(t)
    stream = (
        df.select(F.col(id_col), F.posexplode(F.split(t, r"\s+")))
        .withColumnRenamed("col", "word")
        .filter(F.col("word") != "")
    )
    seg = unigram_encode_words(
        stream.select("word").distinct(), vocab, unk_logp=float(unk_logp)
    )
    return (
        stream.join(seg, "word")
        .select(
            id_col, "pos", "pieces",
            F.round(F.col("score") * 1e10).cast("bigint").alias("__s10"),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum(F.size("pieces")).cast("bigint").alias("n_tokens"),
            F.round(F.sum("__s10") / 1e10, 6).alias("logprob"),
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("pieces")))
                ).getField("pieces")
            ).alias("tokens"),
        )
    )
