"""Unigram-LM tokenizer (operators/unigram): Viterbi optimality vs a
pure-Python reference (hypothesis), tie-break determinism, strict vs
unk-floor modes, seed-vocabulary properties, corpus encode shape, and
plan pins."""

import math

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from mallarddv_spark.exceptions import DVConfigurationError
from mallarddv_spark.functions.litframe import literal_frame
from mallarddv_spark.operators import unigram as ug

SF = "/root/testdata/sf0.001"


def _vocab(spark, entries):
    return literal_frame(
        spark, list(entries.items()), "piece string, logp double"
    )


def _py_viterbi(word, vocab, unk=-20.0):
    """Reference: best-score segmentation; ties prefer longer piece then
    leftmost split (the documented contract)."""
    L = len(word)
    alpha = [(0.0, -1)] + [(-1e30, -1)] * L
    for j in range(1, L + 1):
        best = (-1e30, -1)
        for i in range(0, j):
            piece = word[i:j]
            lp = vocab.get(piece)
            if lp is None and j - i == 1 and unk is not None:
                lp = unk
            if lp is None or alpha[i][0] <= -1e29:
                continue
            cand = alpha[i][0] + lp
            if cand > best[0]:
                best = (cand, i)
        alpha[j] = best
    if alpha[L][0] <= -1e29:
        return None, None
    pieces, pos = [], L
    while pos > 0:
        bp = alpha[pos][1]
        pieces.insert(0, word[bp:pos])
        pos = bp
    return pieces, round(alpha[L][0], 6)


def test_viterbi_optimal_and_tiebreaks(spark):
    vocab = _vocab(spark, {"a": -1.0, "b": -2.0, "ab": -1.5,
                           "abc": -2.5, "c": -3.0})
    words = spark.createDataFrame(
        [("abc",), ("abab",), ("zzz",), ("azb",), ("cab",)], "word string"
    )
    got = {r.word: (r.pieces, r.score)
           for r in ug.unigram_encode_words(words, vocab).collect()}
    assert got["abc"] == (["abc"], -2.5)      # beats [ab,c] and [a,b,c]
    assert got["abab"] == (["ab", "ab"], -3.0)
    assert got["zzz"] == (["z", "z", "z"], -60.0)  # all-unk fallback
    # tie: [ab] (-1.5) vs [a]+[b] would be -3.0 — but make a REAL tie
    tv = _vocab(spark, {"x": -1.0, "xx": -2.0})
    tie = ug.unigram_encode_words(
        spark.createDataFrame([("xx",)], "word string"), tv
    ).first()
    # [xx] = -2.0 == [x, x] = -2.0: longer piece must win
    assert tie.pieces == ["xx"] and tie.score == -2.0


def test_strict_mode_nulls_unsegmentable(spark):
    vocab = _vocab(spark, {"ab": -1.0})
    got = {r.word: r.pieces for r in ug.unigram_encode_words(
        spark.createDataFrame([("abab",), ("abc",)], "word string"),
        vocab, unk_logp=None,
    ).collect()}
    assert got["abab"] == ["ab", "ab"]
    assert got["abc"] is None  # 'c' uncovered, no floor


_pieces = st.dictionaries(
    st.text(alphabet="abc", min_size=1, max_size=3),
    st.floats(min_value=-10.0, max_value=-0.5),
    min_size=1, max_size=8,
)
_word = st.text(alphabet="abc", min_size=1, max_size=8)


@settings(max_examples=10, deadline=None)
@given(_pieces, st.lists(_word, min_size=1, max_size=4, unique=True))
def test_viterbi_matches_python_reference(spark, vocab_dict, words):
    """Spark Viterbi == pure-Python DP on arbitrary small vocabularies:
    same pieces, same 6-dp score, same strict-mode NULLs."""
    vocab_dict = {k: round(v, 3) for k, v in vocab_dict.items()}
    vocab = _vocab(spark, vocab_dict)
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    for unk in (-20.0, None):
        got = {r.word: (r.pieces, r.score)
               for r in ug.unigram_encode_words(
                   wdf, vocab, unk_logp=unk).collect()}
        for w in words:
            pieces, score = _py_viterbi(w, vocab_dict, unk)
            g_pieces, g_score = got[w]
            assert g_pieces == pieces, (w, vocab_dict, g_pieces, pieces)
            if score is None:
                assert g_score is None
            else:
                assert abs(g_score - score) < 1e-6, (w, g_score, score)


def test_seed_vocab_properties(spark):
    docs = spark.createDataFrame(
        [(1, "banana bandana"), (2, "banana ban")], "doc_id bigint, text string"
    )
    v = ug.unigram_seed_vocab(docs, "text", max_piece_len=3, top_k=5)
    rows = {r.piece: r.logp for r in v.collect()}
    # every single character survives regardless of top_k
    for ch in "band":
        assert ch in rows, ch
    # logp normalizes over the kept set: sum of exp(logp) == 1
    assert abs(sum(math.exp(p) for p in rows.values()) - 1.0) < 1e-6
    # frequent substrings outrank rare ones: 'an' (count 7) must be kept
    assert "an" in rows
    # deterministic: a second build is identical
    again = {r.piece: r.logp for r in ug.unigram_seed_vocab(
        docs, "text", max_piece_len=3, top_k=5).collect()}
    assert rows == again
    with pytest.raises(DVConfigurationError, match="top_k"):
        ug.unigram_seed_vocab(docs, "text", top_k=0)
    with pytest.raises(DVConfigurationError, match="max_piece_len"):
        ug.unigram_seed_vocab(docs, "text", max_piece_len=0)


def test_corpus_encode_shape_and_roundtrip(spark):
    """Seed + encode end-to-end on the real documents table: every word
    segments, token concatenation reconstructs the document's words,
    and the doc logprob is the grid-sum of its word scores."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    vocab = ug.unigram_seed_vocab(docs, "text", max_piece_len=4, top_k=512)
    enc = ug.unigram_encode(docs, "doc_id", "text", vocab)
    joined = enc.join(docs, "doc_id").select(
        "doc_id", "tokens", "n_words", "n_tokens",
        F.concat_ws("", F.col("tokens")).alias("glued"),
        F.regexp_replace(F.lower(F.trim("text")), r"\s+", "").alias("flat"),
    )
    bad = joined.filter(F.col("glued") != F.col("flat")).count()
    assert bad == 0
    r = enc.agg(F.min(F.size("tokens")), F.min("logprob")).first()
    assert r[0] >= 1 and r[1] is not None
    # empty docs have no row
    empty = spark.createDataFrame([(99, "   ")], "doc_id bigint, text string")
    assert ug.unigram_encode(empty, "doc_id", "text", vocab).count() == 0


def test_plans_no_python_no_per_word_jobs(spark):
    from mallarddv_spark.plans.audit import plan_report

    vocab = _vocab(spark, {"a": -1.0, "ab": -1.5, "b": -2.0})
    words = spark.createDataFrame([("abab",)], "word string")
    seg = ug.unigram_encode_words(words, vocab)
    rep = plan_report(seg)
    assert rep["python_stages"] == 0
    # the vocabulary rides ONE broadcast map cell and the whole lattice
    # is Catalyst `aggregate(sequence(...))` expressions — no shuffle of
    # the word table, no window, no per-piece join
    plan = seg._jdf.queryExecution().executedPlan().toString()
    assert "aggregate(sequence(1, length(" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "windowspecdefinition" not in plan
    assert rep["sort_merge_joins"] == 0
    docs = spark.createDataFrame([(1, "abab ab")], "doc_id bigint, text string")
    assert plan_report(
        ug.unigram_encode(docs, "doc_id", "text", vocab)
    )["python_stages"] == 0


def _py_em_round(word_counts, vocab):
    """Reference E/M step: forward-backward expected counts, renormalize."""
    from collections import defaultdict

    def lse(s, c):
        return c if s is None else max(s, c) + math.log1p(
            math.exp(-abs(s - c)))

    def fwd(w):
        L = len(w)
        a = [0.0] + [None] * L
        for j in range(1, L + 1):
            s = None
            for i in range(j):
                lp = vocab.get(w[i:j])
                if lp is None or a[i] is None:
                    continue
                s = lse(s, a[i] + lp)
            a[j] = s
        return a

    def bwd(w):
        L = len(w)
        b = [None] * L + [0.0]
        for j in range(L - 1, -1, -1):
            s = None
            for k in range(j + 1, L + 1):
                lp = vocab.get(w[j:k])
                if lp is None or b[k] is None:
                    continue
                s = lse(s, lp + b[k])
            b[j] = s
        return b

    E, LL = defaultdict(float), 0.0
    for w, wc in word_counts.items():
        a, b = fwd(w), bwd(w)
        ll = a[len(w)]
        if ll is None:
            continue
        LL += wc * ll
        for i in range(len(w)):
            for j in range(i + 1, len(w) + 1):
                lp = vocab.get(w[i:j])
                if lp is None or a[i] is None or b[j] is None:
                    continue
                E[w[i:j]] += wc * math.exp(a[i] + lp + b[j] - ll)
    T = sum(E.values())
    return {p: round(math.log(e / T), 10) for p, e in E.items()}, LL


@settings(max_examples=6, deadline=None)
@given(_pieces, st.dictionaries(_word, st.integers(min_value=1, max_value=5),
                                min_size=1, max_size=4))
def test_em_round_matches_python_reference(spark, vocab_dict, word_counts):
    """One Spark EM round == the pure-Python forward-backward E/M step:
    same corpus log-likelihood and the same re-estimated logp per piece
    (coverage-incomplete words excluded identically on both sides)."""
    vocab_dict = {k: round(v, 3) for k, v in vocab_dict.items()}
    want, want_ll = _py_em_round(word_counts, vocab_dict)
    if not want:
        return  # nothing segmentable under this vocabulary
    vocab = _vocab(spark, vocab_dict)
    words = spark.createDataFrame(
        list(word_counts.items()), "word string, wcnt bigint"
    )
    got_vocab, got_ll = ug.unigram_em_round(words, vocab)
    assert abs(got_ll - want_ll) < 1e-6
    got = {r.piece: r.logp for r in got_vocab.collect()}
    assert set(got) == set(want)
    for p in want:
        assert abs(got[p] - want[p]) < 1e-6, (p, got[p], want[p])


def test_em_likelihood_nondecreasing_and_encode_roundtrip(spark):
    """EM's guarantee on the real corpus: the log-likelihood trajectory
    never decreases, and the refined vocabulary still glue-round-trips
    through the encoder."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(30)
    vocab, traj = ug.unigram_train(
        docs, "text", rounds=3, max_piece_len=4, top_k=256
    )
    assert len(traj) == 3
    for a, b in zip(traj, traj[1:]):
        assert b >= a - 1e-6, traj
    enc = ug.unigram_encode(docs, "doc_id", "text", vocab)
    joined = enc.join(docs, "doc_id").select(
        F.concat_ws("", F.col("tokens")).alias("glued"),
        F.regexp_replace(F.lower(F.trim("text")), r"\s+", "").alias("flat"),
    )
    assert joined.filter(F.col("glued") != F.col("flat")).count() == 0
    with pytest.raises(DVConfigurationError, match="rounds"):
        ug.unigram_train(docs, "text", rounds=-1)


def _py_prune_round(word_counts, vocab, target_size):
    """Reference for :func:`unigram_prune_round`: Viterbi usage freq,
    best alternative segmentation of each piece's own string (no
    full-span arc), loss = freq * (logp - alt); keep single chars and
    unsegmentable pieces unconditionally, top-loss multi-char pieces to
    target_size, renormalize in probability space."""

    def vit_score(s):
        # best segmentation score of string s under vocab (full lattice)
        L = len(s)
        a = [0.0] + [-1e30] * L
        for j in range(1, L + 1):
            for i in range(j):
                lp = vocab.get(s[i:j])
                if lp is None or a[i] <= -1e29:
                    continue
                a[j] = max(a[j], a[i] + lp)
        return a

    freq = {}
    for w, wc in word_counts.items():
        pieces, _ = _py_viterbi(w, vocab, unk=None)
        if pieces is None:
            continue
        for p in pieces:
            freq[p] = freq.get(p, 0.0) + wc
    forced, prunable = [], []
    for p, lp in vocab.items():
        if len(p) == 1:
            forced.append(p)
            continue
        a = vit_score(p)
        # suffix-side viterbi via reversed prefix trick is wrong for
        # asymmetric vocabs — compute directly
        L = len(p)
        b = [-1e30] * L + [0.0]
        for j in range(L - 1, -1, -1):
            for k in range(j + 1, L + 1):
                lpp = vocab.get(p[j:k])
                if lpp is None or b[k] <= -1e29:
                    continue
                b[j] = max(b[j], lpp + b[k])
        alt = max(
            (a[m] + b[m] for m in range(1, L)
             if a[m] > -1e29 and b[m] > -1e29),
            default=-1e30,
        )
        if alt <= -1e29:
            forced.append(p)
        else:
            loss = round(freq.get(p, 0.0) * (lp - alt), 10)
            prunable.append((p, loss))
    keep_n = max(0, target_size - len(forced))
    prunable.sort(key=lambda t: (-t[1], t[0]))
    kept = forced + [p for p, _ in prunable[:keep_n]]
    total = sum(math.exp(vocab[p]) for p in kept)
    return {p: round(vocab[p] - math.log(total), 10) for p in kept}


@settings(max_examples=6, deadline=None)
@given(_pieces, st.dictionaries(_word, st.integers(min_value=1, max_value=5),
                                min_size=1, max_size=4),
       st.integers(min_value=1, max_value=6))
def test_prune_round_matches_python_reference(spark, vocab_dict,
                                              word_counts, target):
    """Spark loss-based prune == the pure-Python reference: the same
    kept piece set and the same renormalized logp, for arbitrary small
    vocabularies, corpora, and targets."""
    vocab_dict = {k: round(v, 3) for k, v in vocab_dict.items()}
    want = _py_prune_round(word_counts, vocab_dict, target)
    vocab = _vocab(spark, vocab_dict)
    words = spark.createDataFrame(
        list(word_counts.items()), "word string, wcnt bigint"
    )
    got = {r.piece: r.logp
           for r in ug.unigram_prune_round(words, vocab, target).collect()}
    assert set(got) == set(want), (vocab_dict, word_counts, target)
    for p in want:
        assert abs(got[p] - want[p]) < 1e-6, (p, got[p], want[p])


def test_train_reaches_target_vocab(spark):
    """unigram_train(target_vocab=) shrinks the seed to the target (or
    the forced-coverage floor), the EM trajectory is non-decreasing
    WITHIN each stage (rounds=2 per stage), and the pruned vocabulary
    still glue-round-trips through the encoder."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(30)
    seed = ug.unigram_seed_vocab(docs, "text", max_piece_len=4, top_k=256)
    n_chars = seed.filter(F.length("piece") == 1).count()
    target = n_chars + 40
    vocab, traj = ug.unigram_train(
        docs, "text", rounds=2, max_piece_len=4, top_k=256,
        target_vocab=target,
    )
    assert vocab.count() <= target
    assert len(traj) >= 4 and len(traj) % 2 == 0  # >= 2 stages, 2 EM each
    for s in range(0, len(traj), 2):
        assert traj[s + 1] >= traj[s] - 1e-6, traj
    # every single character of the corpus survives pruning (coverage)
    enc = ug.unigram_encode(docs, "doc_id", "text", vocab, unk_logp=-20.0)
    joined = enc.join(docs, "doc_id").select(
        F.concat_ws("", F.col("tokens")).alias("glued"),
        F.regexp_replace(F.lower(F.trim("text")), r"\s+", "").alias("flat"),
    )
    assert joined.filter(F.col("glued") != F.col("flat")).count() == 0
    with pytest.raises(DVConfigurationError, match="target_vocab"):
        ug.unigram_train(docs, "text", target_vocab=0)
    with pytest.raises(DVConfigurationError, match="shrink_factor"):
        ug.unigram_train(docs, "text", target_vocab=10, shrink_factor=1.5)
    with pytest.raises(DVConfigurationError, match="target_size"):
        ug.unigram_prune_round(docs, seed, 0)


def test_save_load_roundtrip(spark, tmp_path):
    """Persisted vocabulary encodes identically to the in-memory one;
    params ride along; a torn save (no params) fails loudly."""
    docs = spark.createDataFrame(
        [(1, "banana bandana"), (2, "banana ban")],
        "doc_id bigint, text string",
    )
    vocab = ug.unigram_seed_vocab(docs, "text", max_piece_len=3, top_k=64)
    path = str(tmp_path / "ulm")
    ug.save_unigram(vocab, path)
    loaded, params = ug.load_unigram(spark, path)
    assert params == {"lowercase": True}
    a = ug.unigram_encode(docs, "doc_id", "text", vocab).collect()
    b = ug.unigram_encode(docs, "doc_id", "text", loaded).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
    # torn save: vocab written, params missing -> loud failure
    import shutil
    shutil.rmtree(f"{path}/params")
    with pytest.raises(Exception):
        ug.load_unigram(spark, path)


def test_byte_fallback_encodes_oov_chars_as_utf8_bytes(spark):
    vocab = _vocab(spark, {"he": -1.0, "llo": -1.2, "h": -3.0, "e": -3.0,
                           "l": -3.0, "o": -3.0})
    words = spark.createDataFrame(
        [("hello",), ("héllo",), ("héé",), ("日x",)], ["word"]
    )
    got = {
        r.word: (r.pieces, r.score)
        for r in ug.unigram_encode_words(
            words, vocab, byte_fallback=True
        ).collect()
    }

    def bf(ch):
        return [f"<0x{b:02X}>" for b in ch.encode("utf-8")]

    # known pieces untouched
    assert got["hello"][0] == ["he", "llo"]
    # é is OOV -> 2 UTF-8 byte tokens; neighbours still segment normally
    assert got["héllo"][0] == ["h"] + bf("é") + ["llo"]
    assert got["héé"][0] == ["h"] + bf("é") + bf("é")
    # 3-byte CJK char -> 3 byte tokens
    assert got["日x"][0] == bf("日") + bf("x")  # x is OOV here too
    # scores unchanged vs the non-fallback encode (bytes are a surface
    # rewrite of the floored char, not a rescoring)
    plain = {
        r.word: r.score
        for r in ug.unigram_encode_words(words, vocab).collect()
    }
    for w in got:
        assert got[w][1] == plain[w]


def test_byte_fallback_closed_vocab_and_lossless_decode(spark):
    corpus = spark.createDataFrame(
        [(1, "naïve café day"), (2, "日本語 test")], ["doc_id", "text"]
    )
    vocab = _vocab(spark, {"na": -1.0, "ve": -1.1, "caf": -1.2, "day": -1.0,
                           "test": -1.0, "a": -2.0, "e": -2.0, "t": -2.0,
                           "s": -2.0, "d": -2.0, "y": -2.0})
    full = ug.add_byte_pieces(vocab, logp=-19.0)
    assert full.count() == vocab.count() + 256
    # idempotent: re-adding skips existing byte pieces
    assert ug.add_byte_pieces(full).count() == full.count()
    enc = ug.unigram_encode(
        corpus, "doc_id", "text", full, byte_fallback=True
    )
    rows = {r.doc_id: r for r in enc.collect()}
    vocab_set = {r.piece for r in full.collect()}
    for r in rows.values():
        assert set(r.tokens) <= vocab_set, set(r.tokens) - vocab_set
    # lossless: byte tokens decode back to the original words
    def decode(tokens):
        out, buf = [], b""
        for t in tokens:
            if t.startswith("<0x") and t.endswith(">") and len(t) == 6:
                buf += bytes([int(t[3:5], 16)])
            else:
                out.append(buf.decode("utf-8"))
                buf = b""
                out.append(t)
        if buf:
            out.append(buf.decode("utf-8"))
        return "".join(x for x in out if x)

    assert decode(rows[1].tokens) == "naïvecaféday"
    assert decode(rows[2].tokens) == "日本語test"


def test_byte_fallback_requires_unk_floor(spark):
    vocab = _vocab(spark, {"a": -1.0})
    words = spark.createDataFrame([("a",)], ["word"])
    with pytest.raises(DVConfigurationError, match="byte_fallback"):
        ug.unigram_encode_words(
            words, vocab, unk_logp=None, byte_fallback=True
        )
