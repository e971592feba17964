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
  the corpus).
* EM refinement (:func:`unigram_em_round` / :func:`unigram_train`) is
  the real forward-backward E-step — expected piece counts under ALL
  segmentations via sum-product folds over the same lattice machinery
  — and the exact M-step renormalization; the corpus log-likelihood is
  non-decreasing round over round (pytest-pinned). Kudo's loss-based
  vocabulary-shrink schedule is the one simplification (zero-mass
  pieces drop out; the seed's top_k bounds the start); a
  SentencePiece-trained vocabulary loads into the same encoder as
  ``(piece, logp)`` rows when exact reference parity matters.

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
    "add_byte_pieces",
    "unigram_encode_words",
    "unigram_encode",
    "unigram_em_round",
    "unigram_prune_round",
    "unigram_train",
    "save_unigram",
    "load_unigram",
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


def add_byte_pieces(vocab: DataFrame, logp: float = -20.0) -> DataFrame:
    """Extend a ``(piece, logp)`` vocabulary with the 256 byte pieces
    ``<0x00>``..``<0xFF>`` (SentencePiece's ``--byte_fallback``
    inventory) at a floor log-prob, skipping any already present —
    making the vocabulary CLOSED: with
    ``unigram_encode(byte_fallback=True)`` every emitted token is then
    a vocabulary member, the fixed-id-space contract an embedding
    matrix needs."""
    spark = vocab.sparkSession
    bytes_df = spark.range(256).select(
        F.concat(
            F.lit("<0x"),
            F.lpad(F.upper(F.hex(F.col("id"))), 2, "0"),
            F.lit(">"),
        ).alias("piece"),
        F.lit(float(logp)).alias("logp"),
    )
    fresh = bytes_df.join(vocab.select("piece"), "piece", "left_anti")
    return vocab.unionByName(fresh)


#: byte-fallback rewrite of a Viterbi pieces array: pieces the
#: vocabulary map knows pass through; anything else (exactly the
#: unk-floored single characters) is replaced by its UTF-8 bytes as
#: <0xNN> tokens. substr/length operate on BINARY after encode().
_BYTE_FALLBACK = (
    "flatten(transform({pieces}, p -> "
    "CASE WHEN element_at(__vmap, p) IS NOT NULL THEN array(p) "
    "ELSE transform(sequence(1, length(encode(p, 'utf-8'))), i -> "
    "concat('<0x', lpad(upper(hex(substr(encode(p, 'utf-8'), i, 1))), "
    "2, '0'), '>')) END))"
)


def unigram_encode_words(
    words: DataFrame,
    vocab: DataFrame,
    word_col: str = "word",
    unk_logp: float | None = -20.0,
    byte_fallback: bool = False,
) -> DataFrame:
    """Viterbi-segment a table of distinct words under a ``(piece,
    logp)`` vocabulary: ``({word_col}, pieces array<string>, score)``
    with ``score`` the word's best segmentation log-prob (6 dp).

    ``unk_logp`` floors single characters absent from the vocabulary so
    every word segments; pass ``None`` for strict mode, where a word no
    piece sequence covers gets ``pieces = NULL, score = NULL`` (the
    caller decides — drop, quarantine, or re-seed the vocabulary).

    ``byte_fallback`` (SentencePiece's ``--byte_fallback``; the
    Llama-tokenizer convention) rewrites each out-of-vocabulary piece —
    exactly the unk-floored single characters — into its UTF-8 bytes as
    ``<0xNN>`` tokens, so the output token inventory is CLOSED over
    ``vocab`` ∪ :func:`add_byte_pieces` and decoding is lossless.
    Scores are unchanged (the floored char's ``unk_logp`` already
    priced the span); requires the unk floor, so combining it with
    ``unk_logp=None`` raises.

    The whole lattice runs in ONE expression per word: the vocabulary
    broadcasts as a single ``map<piece, logp>`` cell (fine to ~10^5–10^6
    pieces — megabytes; beyond that, shard the encode by piece-length
    tiers), and the O(len²) DP + backtrack execute inside codegen —
    zero Python, zero per-word jobs, cost ∝ vocabulary of the corpus,
    not the corpus. Ties prefer the longer piece, then the leftmost
    split — fully deterministic."""
    if byte_fallback and unk_logp is None:
        raise DVConfigurationError(
            "unigram_encode_words: byte_fallback needs the unk floor "
            "(unk_logp=None segments unknown chars to NULL, not bytes)"
        )
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
    if byte_fallback:
        bt = _BYTE_FALLBACK.format(pieces=f"({bt})")
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
    byte_fallback: bool = False,
    stream: DataFrame | None = None,
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
    convention).

    Cost note: the lattice is O(len²) per distinct word, which is
    nothing for natural words but real for pathological "words" (URLs,
    base64 blobs, minified code — a 10k-char token costs 10^8 lookups).
    Run :func:`textops.quality_filter` / the Gopher repetition battery
    first, or pre-split such tokens — the standard corpus-cleaning
    order, which is why this operator does not silently truncate.

    ``stream`` supplies a pre-built ``(id, pos, word)`` frame from
    :func:`~mallarddv_spark.operators.bpe.whitespace_word_stream` built
    with the same case convention as ``lowercase`` — the
    multi-tokenizer fusion path (one corpus explode shared across
    encoders)."""
    if stream is None:
        from mallarddv_spark.operators.bpe import whitespace_word_stream

        stream = whitespace_word_stream(
            df, id_col, text_col, lowercase=lowercase
        )
    seg = unigram_encode_words(
        stream.select("word").distinct(), vocab,
        unk_logp=float(unk_logp), byte_fallback=byte_fallback,
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


def _lse(a: str, b: str) -> str:
    # log-domain sum with the -1e30 "log zero" sentinel: ln(e^a + e^b)
    # = max + ln1p(e^-|a-b|); fixed evaluation order — deterministic
    return (
        f"CASE WHEN ({a}) <= cast(-1e29 as double) THEN ({b}) "
        f"WHEN ({b}) <= cast(-1e29 as double) THEN ({a}) "
        f"ELSE greatest({a}, {b}) + log1p(exp(-abs(({a}) - ({b})))) END"
    )


def _forward_expr(word_col: str) -> str:
    # alpha[j] = logsumexp over i<j of alpha[i] + logp(piece i..j);
    # element_at(.., p + 1) = alpha for prefix length p. Strict: no unk
    # floor — EM runs on a coverage-complete vocabulary (the seed keeps
    # every single character).
    lp = f"element_at(__vmap, substr({word_col}, i + 1, j - i))"
    cand = f"(element_at(acc, i + 1) + {lp})"
    step = (
        f"aggregate(sequence(0, j - 1), cast(-1e30 as double), "
        f"(s, i) -> CASE WHEN element_at(acc, i + 1) <= cast(-1e29 as "
        f"double) OR {lp} IS NULL THEN s ELSE {_lse('s', cand)} END)"
    )
    return (
        f"aggregate(sequence(1, length({word_col})), "
        f"array(cast(0.0 as double)), (acc, j) -> acc || array({step}))"
    )


def _backward_expr(word_col: str) -> str:
    # beta[j] = logsumexp over k>j of logp(piece j..k) + beta[k], built
    # back-to-front by PREPENDING: at fold step idx the position is
    # j = length - idx (inlined textually — lambdas cannot bind
    # intermediate names) and acc holds [beta_{j+1} .. beta_L], so
    # beta[k] = element_at(acc, k - j). Final array: [beta_0 .. beta_L].
    j = f"(length({word_col}) - idx)"
    lp = f"element_at(__vmap, substr({word_col}, {j} + 1, k - {j}))"
    cand = f"({lp} + element_at(acc, k - {j}))"
    step = (
        f"aggregate(sequence({j} + 1, length({word_col})), "
        f"cast(-1e30 as double), "
        f"(s, k) -> CASE WHEN element_at(acc, k - {j}) <= cast(-1e29 as "
        f"double) OR {lp} IS NULL THEN s ELSE {_lse('s', cand)} END)"
    )
    return (
        f"aggregate(sequence(1, length({word_col})), "
        f"array(cast(0.0 as double)), (acc, idx) -> array({step}) || acc)"
    )


def unigram_em_round(
    words: DataFrame,
    vocab: DataFrame,
    word_col: str = "word",
    count_col: str = "wcnt",
) -> tuple[DataFrame, float]:
    """One EM re-estimation round of the unigram LM (Kudo 2018's E/M
    steps, exactly): forward-backward over every word's segmentation
    lattice gives each piece's EXPECTED count under ALL segmentations
    (not just the Viterbi best), weighted by word frequency; the M-step
    renormalizes ``logp' = ln(E_p / ΣE)``. Returns ``(new_vocab,
    corpus_log_likelihood)`` — the likelihood is Σ wcnt·ln P(word) and
    must not decrease round over round (EM's guarantee; pytest-pinned).

    Pieces whose expected count is zero drop out naturally; single
    characters present in any word always have mass (every lattice path
    through them contributes), so coverage is self-preserving — no
    floor needed.

    Scale shape: both lattice passes are fold expressions over the WORD
    table with the vocabulary in one broadcast map cell (the
    :func:`unigram_encode_words` machinery, sum-product instead of
    max-product); the E-step explodes O(len²) spans per word — still
    vocabulary-sized, never the corpus — into ONE groupBy(piece) with
    map-side combine. Words containing characters outside the
    vocabulary have zero-probability lattices and are excluded from
    both the expected counts and the likelihood (count them via the
    strict encoder if they matter)."""
    vmap = vocab.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("piece"), F.col("logp")))
        ).alias("__vmap")
    )
    base = (
        words.select(
            F.col(word_col).alias("__w"),
            F.col(count_col).cast("double").alias("__wc"),
        )
        .filter(F.length("__w") > 0)
        .crossJoin(F.broadcast(vmap))
        .withColumn("__alphas", F.expr(_forward_expr("__w")))
        .withColumn("__betas", F.expr(_backward_expr("__w")))
        .withColumn(
            "__ll", F.expr("element_at(__alphas, length(__w) + 1)")
        )
        .filter(F.col("__ll") > F.lit(-1e29))
        .localCheckpoint(eager=False)
    )
    ll = (
        base.agg(F.sum(F.col("__wc") * F.col("__ll"))).first()[0] or 0.0
    )
    spans = base.select(
        "__w", "__wc", "__vmap", "__alphas", "__betas", "__ll",
        F.explode(
            F.expr(
                "flatten(transform(sequence(0, length(__w) - 1), i -> "
                "transform(sequence(i + 1, length(__w)), j -> "
                "struct(i as i, j as j))))"
            )
        ).alias("__s"),
    )
    # posterior mass of span (i, j): exp(alpha_i + logp + beta_j - ll)
    post = spans.select(
        F.expr("substr(__w, __s.i + 1, __s.j - __s.i)").alias("piece"),
        F.expr(
            "CASE WHEN element_at(__vmap, substr(__w, __s.i + 1, "
            "__s.j - __s.i)) IS NOT NULL "
            "AND element_at(__alphas, __s.i + 1) > cast(-1e29 as double) "
            "AND element_at(__betas, __s.j + 1) > cast(-1e29 as double) "
            "THEN __wc * exp(element_at(__alphas, __s.i + 1) "
            "+ element_at(__vmap, substr(__w, __s.i + 1, __s.j - __s.i)) "
            "+ element_at(__betas, __s.j + 1) - __ll) END"
        ).alias("__e"),
    ).filter(F.col("__e").isNotNull())
    ecounts = post.groupBy("piece").agg(F.sum("__e").alias("__ec"))
    total = ecounts.agg(F.sum("__ec")).first()[0] or 1.0
    new_vocab = ecounts.select(
        "piece",
        F.round(
            F.log(F.col("__ec") / F.lit(float(total))), 10
        ).alias("logp"),
    )
    return new_vocab, float(ll)


def _viterbi_bwd_expr(word_col: str) -> str:
    # max-product mirror of :func:`_backward_expr`: beta[j] = best
    # segmentation score of the suffix starting at 0-based char j,
    # built back-to-front by prepending; element_at(.., j + 1) = beta_j,
    # beta_L = 0. Strict (no unk floor) — pruning runs on a vocabulary
    # whose own pieces are the "words".
    j = f"(length({word_col}) - idx)"
    lp = f"element_at(__vmap, substr({word_col}, {j} + 1, k - {j}))"
    cand = f"({lp} + element_at(acc, k - {j}))"
    step = (
        f"aggregate(sequence({j} + 1, length({word_col})), "
        f"cast(-1e30 as double), "
        f"(s, k) -> CASE WHEN element_at(acc, k - {j}) <= cast(-1e29 as "
        f"double) OR {lp} IS NULL THEN s ELSE greatest(s, {cand}) END)"
    )
    return (
        f"aggregate(sequence(1, length({word_col})), "
        f"array(cast(0.0 as double)), (acc, idx) -> array({step}) || acc)"
    )


def unigram_prune_round(
    words: DataFrame,
    vocab: DataFrame,
    target_size: int,
    word_col: str = "word",
    count_col: str = "wcnt",
) -> DataFrame:
    """Kudo's loss-based vocabulary shrink (the SentencePiece trainer's
    prune step): score every multi-character piece by the corpus
    likelihood it would cost to remove, keep the costliest until the
    vocabulary is down to ``target_size``, and renormalize.

    The loss follows SentencePiece's approximation: Viterbi-segment the
    word table to get each piece's usage frequency, then for each piece
    compute the best ALTERNATIVE segmentation of the piece's own string
    — the best lattice path that does not use the full-span arc,
    ``max over split m of viterbi_prefix(m) + viterbi_suffix(m)`` —
    and charge ``loss = freq · (logp − alt)``. Unused pieces cost
    nothing and prune first; pieces with NO alternative segmentation
    and all single characters are kept unconditionally (coverage).
    Ties break on ascending piece — fully deterministic.

    Scale shape: the frequency pass is the :func:`unigram_encode_words`
    machinery (vocabulary broadcast as one map cell, corpus-size
    independent — it runs on the WORD table); the alternative-path pass
    runs the same lattice folds over the VOCABULARY table itself
    (10^4–10^5 rows). The keep-cut is an ``orderBy().limit()`` —
    TakeOrderedAndProject over vocabulary-sized input. The one
    driver-side value is the kept probability mass (a one-row agg) for
    the renormalization."""
    if int(target_size) < 1:
        raise DVConfigurationError(
            "unigram_prune_round: target_size must be >= 1"
        )
    # --- usage frequency under Viterbi segmentation of the word table
    seg = unigram_encode_words(
        words.select(F.col(word_col).alias("word")).distinct(),
        vocab, word_col="word", unk_logp=None,
    )
    wc = words.select(
        F.col(word_col).alias("word"),
        F.col(count_col).cast("double").alias("__wc"),
    )
    freq = (
        seg.filter(F.col("pieces").isNotNull())
        .join(wc, "word")
        .select(F.explode("pieces").alias("piece"), "__wc")
        .groupBy("piece")
        .agg(F.sum("__wc").alias("__freq"))
    )
    # --- best alternative segmentation of each piece's own string
    vmap = vocab.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("piece"), F.col("logp")))
        ).alias("__vmap")
    )
    alt_expr = (
        "aggregate(sequence(1, length(piece) - 1), "
        "cast(-1e30 as double), (best, m) -> "
        "CASE WHEN element_at(__alphas, m + 1).s > cast(-1e29 as double) "
        "AND element_at(__betas, m + 1) > cast(-1e29 as double) "
        "THEN greatest(best, element_at(__alphas, m + 1).s "
        "+ element_at(__betas, m + 1)) ELSE best END)"
    )
    scored = (
        vocab.crossJoin(F.broadcast(vmap))
        .withColumn("__alphas", F.expr(_viterbi_expr("piece", "cast(null as double)")))
        .withColumn("__betas", F.expr(_viterbi_bwd_expr("piece")))
        .withColumn(
            "__alt",
            F.when(F.length("piece") > 1, F.expr(alt_expr)),
        )
        .join(freq, "piece", "left")
        .select(
            "piece", "logp",
            F.coalesce(F.col("__freq"), F.lit(0.0)).alias("__freq"),
            "__alt",
        )
    )
    forced = scored.filter(
        (F.length("piece") == 1) | (F.col("__alt") <= F.lit(-1e29))
    )
    prunable = scored.filter(
        (F.length("piece") > 1) & (F.col("__alt") > F.lit(-1e29))
    )
    n_forced = forced.count()
    keep_n = max(0, int(target_size) - n_forced)
    loss = F.round(
        F.col("__freq") * (F.col("logp") - F.col("__alt")), 10
    )
    kept = (
        prunable.withColumn("__loss", loss)
        .orderBy(F.desc("__loss"), F.asc("piece"))
        .limit(keep_n)
        .select("piece", "logp")
        .unionByName(forced.select("piece", "logp"))
    )
    # renormalize in probability space: ONE row comes back to the driver
    total = kept.agg(F.sum(F.exp("logp"))).first()[0] or 1.0
    import math

    return kept.select(
        "piece",
        F.round(F.col("logp") - F.lit(math.log(float(total))), 10).alias(
            "logp"
        ),
    )


def unigram_train(
    df: DataFrame,
    text_col: str,
    rounds: int = 2,
    max_piece_len: int = 8,
    top_k: int = 8192,
    lowercase: bool = True,
    target_vocab: int | None = None,
    shrink_factor: float = 0.75,
) -> tuple[DataFrame, list[float]]:
    """Seed + EM-refine a unigram-LM vocabulary — the Kudo 2018
    pipeline: :func:`unigram_seed_vocab` initializes, ``rounds`` of
    :func:`unigram_em_round` re-estimate, and (when ``target_vocab`` is
    given) :func:`unigram_prune_round` shrinks the vocabulary by
    ``shrink_factor`` per stage until it reaches the target, with a
    fresh EM re-fit after every prune — the SentencePiece trainer's
    seed → (EM × rounds → prune) × stages → EM schedule. Returns
    ``(vocab, log_likelihood_trajectory)`` with one entry per EM round
    across all stages; within a stage the trajectory is non-decreasing
    (EM's guarantee — pytest-pinned), while a prune boundary may step
    down (fewer pieces = less probability mass, the expected cost of a
    smaller vocabulary).

    Without ``target_vocab`` the behavior is the pre-r10 trainer:
    zero-expectation pieces drop out each round and the seed's
    ``top_k`` bounds the start. A SentencePiece-trained vocabulary
    remains loadable directly into :func:`unigram_encode` when exact
    parity with the reference implementation matters."""
    if int(rounds) < 0:
        raise DVConfigurationError("unigram_train: rounds must be >= 0")
    if target_vocab is not None and int(target_vocab) < 1:
        raise DVConfigurationError(
            "unigram_train: target_vocab must be >= 1"
        )
    if not (0.0 < float(shrink_factor) < 1.0):
        raise DVConfigurationError(
            "unigram_train: shrink_factor must be in (0, 1)"
        )
    t = F.trim(F.col(text_col))
    if lowercase:
        t = F.lower(t)
    words = (
        df.select(F.explode(F.split(t, r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("wcnt"))
        .localCheckpoint(eager=False)
    )
    vocab = unigram_seed_vocab(
        df, text_col, max_piece_len=max_piece_len, top_k=top_k,
        lowercase=lowercase,
    )
    trajectory: list[float] = []

    def _em_stage(v):
        for _ in range(int(rounds)):
            v, ll = unigram_em_round(words, v)
            v = v.localCheckpoint(eager=True)
            trajectory.append(ll)
        return v

    vocab = _em_stage(vocab)
    if target_vocab is None:
        return vocab, trajectory
    size = vocab.count()
    while size > int(target_vocab):
        stage_target = max(int(target_vocab), int(size * float(shrink_factor)))
        vocab = unigram_prune_round(
            words, vocab, stage_target
        ).localCheckpoint(eager=True)
        vocab = _em_stage(vocab)
        new_size = vocab.count()
        if new_size >= size:
            break  # forced pieces alone exceed the target — cannot shrink
        size = new_size
    return vocab, trajectory


def save_unigram(vocab: DataFrame, path: str, lowercase: bool = True) -> None:
    """Persist a unigram vocabulary: ``{path}/vocab`` parquet plus a
    one-row ``{path}/params`` written LAST — its presence marks the
    model complete (the save_bpe / NB-classifier convention)."""
    from mallarddv_spark.functions.litframe import literal_frame

    spark = vocab.sparkSession
    vocab.select("piece", "logp").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/vocab")
    literal_frame(
        spark, [(bool(lowercase),)], "lowercase boolean"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")


def load_unigram(spark, path: str) -> tuple[DataFrame, dict]:
    """Load a model persisted by :func:`save_unigram`: the ``(piece,
    logp)`` vocabulary and its params. A missing ``params`` directory
    (torn save) fails loudly here rather than silently encoding under
    default settings."""
    p = spark.read.parquet(f"{path}/params").first()
    return (
        spark.read.parquet(f"{path}/vocab"),
        {"lowercase": bool(p.lowercase)},
    )
