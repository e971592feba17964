"""BPE tokenizer training/encoding (operators/bpe): exact differential
against a pure-Python reference implementation of Sennrich et al. 2016,
lossless-decode property, determinism, scale-shape plan pins.

Reference scope note: no tokenizer stage exists in the reference engine
— this extends the training-data pipeline tier.
"""

import re
from collections import Counter

import pytest
from pyspark.sql import Row

from mallarddv_spark.exceptions import DVConfigurationError
from mallarddv_spark.operators.bpe import (
    EOW,
    bpe_encode,
    bpe_encode_words,
    train_bpe,
    word_frequencies,
)

SF = "/root/testdata/sf0.001"


# --- pure-Python reference (the Sennrich pseudo-code, verbatim logic) ---

def _py_symbols(word):
    return [c if i < len(word) - 1 else c + EOW for i, c in enumerate(word)]


def _py_merge(syms, a, b):
    out = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _py_train(texts, num_merges, min_pair_count=2):
    words = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip().lower()):
            if w:
                words[w] += 1
    vocab = {w: _py_symbols(w) for w in words}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += words[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_pair_count:
            break
        merges.append(best)
        vocab = {w: _py_merge(s, *best) for w, s in vocab.items()}
    return merges, vocab


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_train_matches_python_reference(spark, docs):
    """30 merges learned from the real corpus equal the reference
    implementation's, in order — counts, tie-breaks, greedy rewrites."""
    texts = [r.text for r in docs.select("text").collect()]
    want_merges, want_vocab = _py_train(texts, 30)
    bpe = train_bpe(docs, "text", num_merges=30)
    assert bpe["merges"] == want_merges
    # and the encoding of every distinct word matches the reference
    enc = {
        r.word: list(r.tokens)
        for r in bpe_encode_words(
            word_frequencies(docs).select("word"), bpe
        ).collect()
    }
    assert enc == want_vocab


def test_encode_lossless_and_counts(spark, docs):
    """Concatenating a doc's tokens (minus the EOW markers) restores the
    whitespace-normalized text; n_tokens <= characters, >= n_words."""
    bpe = train_bpe(docs, "text", num_merges=20)
    sample = docs.filter("doc_id < 20")
    out = {r.doc_id: r for r in bpe_encode(sample, "doc_id", "text", bpe).collect()}
    for r in sample.collect():
        norm = re.sub(r"\s+", " ", r.text.strip().lower())
        got = out[r.doc_id]
        rebuilt = "".join(got.tokens).replace(EOW, " ").rstrip()
        assert rebuilt == norm
        assert got.n_words == len(norm.split(" "))
        assert got.n_words <= got.n_tokens <= len(norm.replace(" ", "")) + got.n_words


def test_merges_compress(spark, docs):
    """More merges, fewer tokens — monotone on the same corpus."""
    few = train_bpe(docs, "text", num_merges=5)
    many = train_bpe(docs, "text", num_merges=40)
    n = lambda b: (
        bpe_encode(docs, "doc_id", "text", b)
        .agg({"n_tokens": "sum"}).first()[0]
    )
    n_few, n_many = n(few), n(many)
    assert n_many < n_few


def test_early_stop_and_guard(spark):
    corpus = spark.createDataFrame([Row(doc_id=1, text="ab ab xy")])
    # after merging a+b▁ and x+y▁ every pair is gone -> early stop
    bpe = train_bpe(corpus, "text", num_merges=50, min_pair_count=1)
    assert 0 < len(bpe["merges"]) < 50
    with pytest.raises(DVConfigurationError, match="num_merges"):
        train_bpe(corpus, "text", num_merges=0)


def test_min_pair_count_stops_singleton_memorization(spark):
    corpus = spark.createDataFrame(
        [Row(doc_id=1, text="aa aa aa zq")]  # 'zq' pairs occur once
    )
    bpe = train_bpe(corpus, "text", num_merges=50, min_pair_count=2)
    flat = {s for m in bpe["merges"] for s in m} | {
        a + b for a, b in bpe["merges"]
    }
    assert not any("z" in s or "q" in s for s in flat)


def test_encode_plan_no_python_and_vocab_sized(spark, docs):
    """The encode plan carries no Python stages, and the merge replay
    subtree hangs off the DISTINCT-words aggregate, not the corpus."""
    from mallarddv_spark.plans.audit import plan_report

    bpe = train_bpe(docs, "text", num_merges=10)
    rep = plan_report(bpe_encode(docs, "doc_id", "text", bpe))
    assert rep["python_stages"] == 0
    assert rep["nested_loop_joins"] == 0


def test_persisted_model_parity(spark, docs, tmp_path):
    from mallarddv_spark.operators.bpe import load_bpe, save_bpe

    bpe = train_bpe(docs, "text", num_merges=12)
    p = str(tmp_path / "bpe")
    save_bpe(spark, bpe, p)
    stored = load_bpe(spark, p)
    assert stored == bpe
    a = bpe_encode(docs.filter("doc_id < 10"), "doc_id", "text", bpe)
    b = bpe_encode(docs.filter("doc_id < 10"), "doc_id", "text", stored)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# --- property test: arbitrary corpora vs the pure-Python reference ---

from hypothesis import given, settings, strategies as st  # noqa: E402

_word = st.text(alphabet="abcxyz", min_size=1, max_size=5)
_doc = st.lists(_word, min_size=0, max_size=6).map(" ".join)


@settings(max_examples=5, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=8))
def test_bpe_property_matches_python(spark, texts):
    want_merges, want_vocab = _py_train(texts, 12, min_pair_count=2)
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    bpe = train_bpe(corpus, "text", num_merges=12, min_pair_count=2)
    assert bpe["merges"] == want_merges
    if want_vocab:
        enc = {
            r.word: list(r.tokens)
            for r in bpe_encode_words(
                word_frequencies(corpus).select("word"), bpe
            ).collect()
        }
        assert enc == want_vocab


def test_merge_batching_matches_sequential(spark, docs):
    """The batched trainer (one counting round per non-interacting merge
    set) must reproduce the classic one-merge-per-round loop EXACTLY —
    same merges, same rank order — on a real corpus slice."""
    batched = train_bpe(docs, "text", num_merges=40)
    seq = train_bpe(docs, "text", num_merges=40, merge_batch=1)
    assert batched["merges"] == seq["merges"]
    assert len(batched["merges"]) == 40


def test_merge_batch_guard(spark):
    corpus = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    with pytest.raises(DVConfigurationError, match="merge_batch"):
        train_bpe(corpus, "text", num_merges=5, merge_batch=0)


def test_approx_batching_valid_tokenizer(spark, docs):
    """exact_rank=False (the realistic 32k-vocab path) may reorder
    merges near count ties, but must still learn the same merge SET on
    an unambiguous corpus slice and encode losslessly."""
    approx = train_bpe(docs, "text", num_merges=30, exact_rank=False)
    assert len(approx["merges"]) == 30
    assert len(set(approx["merges"])) == 30          # no duplicate merges
    # round-trip: concatenating tokens and mapping ▁ back to spaces
    # reconstructs the normalized text exactly
    enc = bpe_encode(docs.filter("doc_id < 20"), "doc_id", "text", approx)
    joined = docs.filter("doc_id < 20").join(enc, "doc_id").selectExpr(
        "replace(concat_ws('', tokens), '▁', ' ') AS dec",
        "lower(concat(trim(regexp_replace(text, '\\\\s+', ' ')), ' ')) AS want",
    )
    assert joined.filter("dec <> want").count() == 0
    # quality bar: at equal merge budget the approx vocabulary must
    # compress comparably to the sequential one (it goes "wide" — many
    # shallow merges per round — where sequential goes "deep", so the
    # merge SETS legitimately differ; what matters is tokens saved)
    seq = train_bpe(docs, "text", num_merges=30, merge_batch=1)
    slice_ = docs.filter("doc_id < 50")
    n_seq = bpe_encode(slice_, "doc_id", "text", seq).agg(
        {"n_tokens": "sum"}).first()[0]
    n_apx = bpe_encode(slice_, "doc_id", "text", approx).agg(
        {"n_tokens": "sum"}).first()[0]
    assert n_apx <= n_seq * 1.10, (n_apx, n_seq)


# --- byte-level (GPT-2) mode ---

def _py_bytes_to_unicode():
    # independent re-derivation of the GPT-2 alphabet (Radford et al.
    # 2019 encoder): printable bytes map to themselves, the rest shift
    # to 256+
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


# ASCII-equivalent of GPT2_PRETOKEN_RE for the pure-Python reference
# (Python re lacks \p{L}; on ASCII-only corpora the classes coincide)
_PY_GPT2_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"
    r"|\s+(?!\S)|\s+"
)


def _py_train_bytes(texts, num_merges, min_pair_count=2):
    b2u = _py_bytes_to_unicode()
    words = Counter()
    for t in texts:
        for w in _PY_GPT2_RE.findall(t):
            words[w] += 1
    vocab = {w: [b2u[b] for b in w.encode("utf-8")] for w in words}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += words[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_pair_count:
            break
        merges.append(best)
        vocab = {w: _py_merge(s, *best) for w, s in vocab.items()}
    return merges, vocab


def test_byte_chars_pin_gpt2_alphabet():
    from mallarddv_spark.operators.bpe import BYTE_CHARS

    b2u = _py_bytes_to_unicode()
    assert len(BYTE_CHARS) == 256
    assert len(set(BYTE_CHARS)) == 256
    for b in range(256):
        assert BYTE_CHARS[b] == b2u[b]
    # printables map to themselves; space maps to the famous Ġ
    assert BYTE_CHARS[ord("a")] == "a"
    assert BYTE_CHARS[ord(" ")] == "Ġ"


def test_byte_level_train_matches_python_reference(spark, docs):
    """30 byte-level merges learned from the real corpus equal the
    pure-Python GPT-2 reference exactly, rank for rank (the corpus is
    ASCII, where the Java and Python pre-tokenizers coincide)."""
    sample = docs.filter("doc_id < 120")
    texts = [r.text for r in sample.select("text").collect()]
    assert all(t == t.encode("ascii", "ignore").decode() for t in texts)
    want_merges, _ = _py_train_bytes(texts, 30)
    got = train_bpe(sample, "text", num_merges=30,
                    byte_level=True, lowercase=False)
    assert got["byte_level"] is True
    assert got["merges"] == want_merges


def test_byte_level_roundtrip_lossless_unicode(spark):
    from mallarddv_spark.operators.bpe import decode_byte_tokens

    texts = [
        "Hello  world!\n\tIt's mixed:  café — naïve",
        "emoji \U0001f600\U0001f680 and CJK 漢字 ok",
        "  leading and trailing  ",
        "▁10% of ▁markers are fine here",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    bpe = train_bpe(df, "text", num_merges=15, byte_level=True,
                    lowercase=False, min_pair_count=2)
    enc = {r.doc_id: r.tokens
           for r in bpe_encode(df, "doc_id", "text", bpe).collect()}
    for i, t in enumerate(texts):
        assert decode_byte_tokens(enc[i]) == t


def test_byte_level_persisted_model_parity(spark, docs, tmp_path):
    from mallarddv_spark.operators.bpe import load_bpe, save_bpe

    bpe = train_bpe(docs, "text", num_merges=12, byte_level=True,
                    lowercase=False)
    p = str(tmp_path / "bpe_bytes")
    save_bpe(spark, bpe, p)
    stored = load_bpe(spark, p)
    assert stored == bpe
    a = bpe_encode(docs.filter("doc_id < 10"), "doc_id", "text", bpe)
    b = bpe_encode(docs.filter("doc_id < 10"), "doc_id", "text", stored)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_byte_level_legacy_params_load_whitespace_mode(spark, tmp_path):
    """Models persisted before byte_level existed (params lacks the
    column) must load as whitespace-mode."""
    from mallarddv_spark.functions.litframe import literal_frame
    from mallarddv_spark.operators.bpe import load_bpe

    p = str(tmp_path / "bpe_old")
    literal_frame(
        spark, [(0, "a", "b")], "rank int, a string, b string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{p}/merges")
    literal_frame(
        spark, [(True,)], "lowercase boolean"
    ).coalesce(1).write.mode("overwrite").parquet(f"{p}/params")
    m = load_bpe(spark, p)
    assert m["byte_level"] is False
    assert m["merges"] == [("a", "b")]


def test_byte_level_encode_plan_no_python(spark, docs):
    from mallarddv_spark.plans.audit import plan_report

    bpe = train_bpe(docs, "text", num_merges=8, byte_level=True,
                    lowercase=False)
    rep = plan_report(bpe_encode(docs, "doc_id", "text", bpe))
    assert rep["python_stages"] == 0
    assert rep["nested_loop_joins"] == 0


def test_gpt2_file_pair_roundtrip(spark, docs, tmp_path):
    from mallarddv_spark.operators.bpe import (
        export_gpt2_files,
        load_gpt2_files,
    )

    bpe = train_bpe(docs, "text", num_merges=15, byte_level=True,
                    lowercase=False)
    p = str(tmp_path / "gpt2")
    export_gpt2_files(bpe, p, specials=["<|endoftext|>"])
    # file shapes: header line, one line per merge; vocab ids contiguous
    lines = open(f"{p}/merges.txt", encoding="utf-8").read().splitlines()
    assert lines[0] == "#version: 0.2"
    assert len(lines) == 1 + len(bpe["merges"])
    import json

    vocab = json.load(open(f"{p}/vocab.json", encoding="utf-8"))
    assert sorted(vocab.values()) == list(range(len(vocab)))
    assert vocab["<|endoftext|>"] == len(vocab) - 1
    loaded = load_gpt2_files(p)
    assert loaded["merges"] == bpe["merges"]
    assert loaded["byte_level"] is True and loaded["lowercase"] is False
    a = bpe_encode(docs.filter("doc_id < 8"), "doc_id", "text", bpe)
    b = bpe_encode(docs.filter("doc_id < 8"), "doc_id", "text", loaded)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_gpt2_files_guards(spark, docs, tmp_path):
    from mallarddv_spark.operators.bpe import (
        export_gpt2_files,
        load_gpt2_files,
    )

    ws = train_bpe(docs, "text", num_merges=5)
    with pytest.raises(DVConfigurationError, match="byte-level"):
        export_gpt2_files(ws, str(tmp_path / "nope"))
    # inconsistent pair: merge product missing from vocab
    p = str(tmp_path / "badpair")
    bl = train_bpe(docs, "text", num_merges=5, byte_level=True,
                   lowercase=False)
    export_gpt2_files(bl, p)
    import json

    vocab = json.load(open(f"{p}/vocab.json", encoding="utf-8"))
    a, b = bl["merges"][0]
    del vocab[a + b]
    json.dump(vocab, open(f"{p}/vocab.json", "w", encoding="utf-8"),
              ensure_ascii=False)
    with pytest.raises(DVConfigurationError, match="inconsistent"):
        load_gpt2_files(p)


def test_byte_level_lowercase_default_and_export_guard(spark, docs, tmp_path):
    """byte_level=True defaults lowercase=False (the GPT-2 convention
    and the only flag the file pair can carry); a lowercase=True byte
    model is rejected at export because importers assume False and the
    round-trip would silently change tokenization (ADVICE r11)."""
    from mallarddv_spark.operators.bpe import export_gpt2_files

    bl = train_bpe(docs, "text", num_merges=5, byte_level=True)
    assert bl["lowercase"] is False
    # whitespace mode keeps its case-folding default
    ws = train_bpe(docs, "text", num_merges=5)
    assert ws["lowercase"] is True
    folded = train_bpe(docs, "text", num_merges=5, byte_level=True,
                       lowercase=True)
    with pytest.raises(DVConfigurationError, match="lowercase"):
        export_gpt2_files(folded, str(tmp_path / "nolower"))


def test_gpt2_pretoken_unicode_whitespace(spark):
    """(?U) makes Java's \\s match Unicode whitespace, so NBSP and
    ideographic space pre-tokenize as whitespace runs exactly like the
    published Python-regex GPT-2 pattern (ADVICE r11) — and encoding
    stays lossless either way."""
    from pyspark.sql import functions as F
    from mallarddv_spark.operators.bpe import (
        GPT2_PRETOKEN_RE, bpe_encode, decode_byte_tokens,
    )

    text = "a\u00a0b\u3000c"  # NBSP + ideographic space
    toks = (
        spark.range(1)
        .select(F.regexp_extract_all(F.lit(text),
                                     F.lit(GPT2_PRETOKEN_RE), F.lit(0))
                .alias("t"))
        .collect()[0].t
    )
    # the published behavior: each gap is its own whitespace run
    assert toks == ["a", "\u00a0", "b", "\u3000", "c"]
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    bpe = train_bpe(df, "text", num_merges=1, byte_level=True,
                    min_pair_count=1)
    enc = bpe_encode(df, "doc_id", "text", bpe).collect()[0].tokens
    assert decode_byte_tokens(enc) == text


# --- fold replay (single-pass encode for realistic vocab sizes) ---

def test_fold_replay_identical_to_sequential(spark, docs):
    """The single-expression best-rank-pair replay must produce
    token-for-token identical output to the rank-order sequential
    replay — both whitespace and byte-level modes, real corpus."""
    from mallarddv_spark.operators.bpe import (
        byte_word_frequencies,
        word_frequencies,
    )

    for bl in (False, True):
        m = train_bpe(docs, "text", num_merges=60, byte_level=bl,
                      lowercase=not bl)
        wf = (byte_word_frequencies(docs, "text", False) if bl
              else word_frequencies(docs, "text", True)).select("word")
        a = {r.word: tuple(r.tokens)
             for r in bpe_encode_words(wf, m, replay="sequential").collect()}
        b = {r.word: tuple(r.tokens)
             for r in bpe_encode_words(wf, m, replay="fold").collect()}
        assert a == b


@settings(max_examples=5, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=8))
def test_fold_replay_property_matches_sequential(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    m = train_bpe(df, "text", num_merges=12, min_pair_count=2)
    if not m["merges"]:
        return
    words = df.selectExpr(
        "explode(split(trim(lower(text)), '\\\\s+')) AS word"
    ).filter("word <> ''").distinct()
    a = {r.word: tuple(r.tokens)
         for r in bpe_encode_words(words, m, replay="sequential").collect()}
    b = {r.word: tuple(r.tokens)
         for r in bpe_encode_words(words, m, replay="fold").collect()}
    assert a == b


def test_fold_replay_guard_and_auto(spark, docs):
    from mallarddv_spark.operators.bpe import word_frequencies

    m = train_bpe(docs, "text", num_merges=5)
    wf = word_frequencies(docs, "text", True).select("word").limit(5)
    with pytest.raises(DVConfigurationError, match="replay"):
        bpe_encode_words(wf, m, replay="nope")
    # auto at tiny merge counts = sequential; both shapes still agree
    a = sorted(map(tuple, bpe_encode_words(wf, m).collect()))
    b = sorted(map(tuple, bpe_encode_words(wf, m, replay="fold").collect()))
    assert a == b


def test_fold_replay_plan_no_python_no_per_merge_passes(spark, docs):
    from mallarddv_spark.plans.audit import plan_report

    m = train_bpe(docs, "text", num_merges=60, byte_level=True,
                  lowercase=False)
    enc = bpe_encode(docs, "doc_id", "text", m)
    rep = plan_report(enc)
    assert rep["python_stages"] == 0
    # the fold path is ONE projection over the distinct-word table: the
    # plan must not contain a chain of per-merge projections
    plan = enc._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("aggregate(sequence") <= 4


def test_tokens_to_ids_closed_roundtrip_and_unk(spark, docs):
    from mallarddv_spark.operators.bpe import (
        bpe_vocab,
        decode_byte_tokens,
        tokens_to_ids,
    )

    m = train_bpe(docs, "text", num_merges=40, byte_level=True,
                  lowercase=False)
    vocab = bpe_vocab(m, specials=["<|endoftext|>"])
    assert sorted(vocab.values()) == list(range(len(vocab)))
    enc = bpe_encode(docs.filter("doc_id < 20"), "doc_id", "text", m)
    ids = tokens_to_ids(enc, "tokens", vocab)
    inv = {v: k for k, v in vocab.items()}
    rows = ids.collect()
    assert rows
    for r in rows:
        # byte-level vocab is CLOSED: no NULL ids, and mapping back
        # through the inverse reproduces the token sequence + text
        assert all(i is not None for i in r.ids)
        toks = [inv[i] for i in r.ids]
        assert toks == list(r.tokens)
    # open-vocab path: an unknown token NULLs (loud) or takes unk_id
    probe = spark.createDataFrame(
        [(1, ["nope-token"])], "doc_id bigint, tokens array<string>"
    )
    got = tokens_to_ids(probe, "tokens", vocab).collect()[0]
    assert got.ids == [None]
    got2 = tokens_to_ids(probe, "tokens", vocab, unk_id=0).collect()[0]
    assert got2.ids == [0]
    # gpt2 vocab.json agreement: same table as the exported file
    import json as _json
    import tempfile

    from mallarddv_spark.operators.bpe import export_gpt2_files

    d = tempfile.mkdtemp()
    export_gpt2_files(m, d, specials=["<|endoftext|>"])
    assert _json.load(open(f"{d}/vocab.json", encoding="utf-8")) == vocab


def test_ids_to_tokens_inverse_and_byte_roundtrip(spark, docs):
    """ids_to_tokens inverts tokens_to_ids in-engine: closed byte-level
    vocab round-trips tokens → ids → tokens exactly and the decoded
    concatenation reproduces the source text; unknown ids (including a
    tokens_to_ids unk_id placeholder) come back as NULL elements."""
    from mallarddv_spark.operators.bpe import (
        bpe_vocab,
        decode_byte_tokens,
        ids_to_tokens,
        tokens_to_ids,
    )

    m = train_bpe(docs, "text", num_merges=40, byte_level=True,
                  lowercase=False)
    vocab = bpe_vocab(m, specials=["<|endoftext|>"])
    sl = docs.filter("doc_id < 20")
    enc = bpe_encode(sl, "doc_id", "text", m)
    back = ids_to_tokens(
        tokens_to_ids(enc, "tokens", vocab).select("doc_id", "tokens",
                                                   "ids"),
        "ids", vocab, out_col="tokens2",
    )
    orig = {r.doc_id: r.text for r in sl.collect()}
    rows = back.collect()
    assert rows
    for r in rows:
        assert list(r.tokens2) == list(r.tokens)
        assert decode_byte_tokens(r.tokens2) == orig[r.doc_id]
    # unknown id and unk_id placeholder → NULL element, loudly
    probe = spark.createDataFrame(
        [(1, [0, len(vocab) + 7, -1])], "doc_id bigint, ids array<int>"
    )
    got = ids_to_tokens(probe, "ids", vocab).collect()[0]
    inv = {v: k for k, v in vocab.items()}
    assert got.tokens[0] == inv[0]
    assert got.tokens[1] is None and got.tokens[2] is None


def test_fold_replay_pathological_long_pretoken(spark):
    """A 2000-char base64-ish blob (one giant letter/digit-run
    pre-token) must encode losslessly in bounded time — the O(len²)
    fold-cost regression pin."""
    import random

    from mallarddv_spark.operators.bpe import decode_byte_tokens

    rnd = random.Random(3)
    blob = "".join(
        rnd.choice("ABCDEFGHIJKLMNOPabcdef0123456789")
        for _ in range(2000)
    )
    docs = spark.createDataFrame(
        [(0, "the low bar and the lower bar " * 10), (1, blob)],
        ["doc_id", "text"],
    )
    m = train_bpe(docs, "text", num_merges=60, byte_level=True,
                  lowercase=False, min_pair_count=2)
    enc = {r.doc_id: r.tokens
           for r in bpe_encode(docs, "doc_id", "text", m).collect()}
    assert decode_byte_tokens(enc[1]) == blob
