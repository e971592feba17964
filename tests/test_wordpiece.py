"""WordPiece tokenizer training/encoding (operators/wordpiece): exact
differential against a pure-Python reference of the BERT formulation
(likelihood-scored merges, greedy longest-match encode, [UNK] fallback),
persistence round-trip, scale-shape plan pins.

Reference scope note: no tokenizer stage exists in the reference engine
— this completes the training-data pipeline's tokenizer triad.
"""

import re
from collections import Counter

import pytest
from pyspark.sql import Row

from mallarddv_spark.exceptions import DVConfigurationError
from mallarddv_spark.operators.bpe import word_frequencies
from mallarddv_spark.operators.wordpiece import (
    CONT,
    UNK,
    load_wordpiece,
    save_wordpiece,
    train_wordpiece,
    wordpiece_encode,
    wordpiece_encode_words,
)

SF = "/root/testdata/sf0.001"


# --- pure-Python reference (the HF-course WordPiece pseudo-code) ---

def _py_symbols(word):
    return [word[0]] + [CONT + c for c in word[1:]]


def _py_merge(syms, a, b, prod):
    out = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = prod
        else:
            out.append(x)
    return out


def _py_train(texts, num_merges, min_pair_count=2):
    words = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip().lower()):
            if w:
                words[w] += 1
    seg = {w: _py_symbols(w) for w in words}
    alphabet = sorted({s for syms in seg.values() for s in syms})
    merges = []
    for _ in range(num_merges):
        pairs, sym = Counter(), Counter()
        for w, syms in seg.items():
            for s in syms:
                sym[s] += words[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += words[w]
        eligible = {g: c for g, c in pairs.items() if c >= min_pair_count}
        if not eligible:
            break
        # same IEEE-double score and (a, b) tie-break as the engine
        best = min(
            eligible.items(),
            key=lambda kv: (-(kv[1] / (sym[kv[0][0]] * sym[kv[0][1]])), kv[0]),
        )[0]
        a, b = best
        prod = a + b[len(CONT):]
        merges.append(prod)
        seg = {w: _py_merge(s, a, b, prod) for w, s in seg.items()}
    return alphabet + merges


def _py_encode(word, vocab, max_chars=100):
    if len(word) > max_chars:
        return [UNK]
    pos, ps = 0, []
    while pos < len(word):
        hit = None
        for ln in range(len(word) - pos, 0, -1):
            piece = (
                word[pos:pos + ln] if pos == 0
                else CONT + word[pos:pos + ln]
            )
            if piece in vocab:
                hit = (ln, piece)
                break
        if hit is None:
            return [UNK]
        ps.append(hit[1])
        pos += hit[0]
    return ps


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def model(docs):
    return train_wordpiece(docs, "text", num_merges=30)


def test_train_matches_python_reference(spark, docs, model):
    texts = [r.text for r in docs.select("text").collect()]
    assert model["vocab"] == _py_train(texts, 30)


def test_encode_words_matches_python_reference(spark, docs, model):
    vocab = set(model["vocab"])
    got = {
        r.word: list(r.tokens)
        for r in wordpiece_encode_words(
            word_frequencies(docs).select("word"), model
        ).collect()
    }
    for w, toks in got.items():
        assert toks == _py_encode(w, vocab), w
    # greedy cover is lossless for every non-UNK word
    for w, toks in got.items():
        if toks != [UNK]:
            assert "".join(t[len(CONT):] if t.startswith(CONT) else t
                           for t in toks) == w


def test_unk_fallback_and_length_cap(spark, model):
    words = spark.createDataFrame(
        [Row(word="zzqx9"), Row(word="a" * 300)]
    )
    out = {r.word: list(r.tokens)
           for r in wordpiece_encode_words(words, model).collect()}
    assert out["zzqx9"] == [UNK]          # chars outside the alphabet
    assert out["a" * 300] == [UNK]        # over max_input_chars_per_word
    # and with a generous cap the long word segments (alphabet covers 'a')
    relaxed = wordpiece_encode_words(
        words.filter("word != 'zzqx9'"), model,
        max_input_chars_per_word=400,
    ).first()
    assert relaxed.tokens[0] != UNK


def test_corpus_encode_shape_and_unk_count(spark, docs, model):
    sample = docs.filter("doc_id < 20")
    out = {r.doc_id: r
           for r in wordpiece_encode(sample, "doc_id", "text", model).collect()}
    vocab = set(model["vocab"])
    for r in sample.collect():
        norm = re.sub(r"\s+", " ", r.text.strip().lower())
        words = norm.split(" ")
        got = out[r.doc_id]
        assert got.n_words == len(words)
        flat = [t for w in words for t in _py_encode(w, vocab)]
        assert list(got.tokens) == flat
        assert got.n_unk == sum(1 for t in flat if t == UNK)
        assert got.n_tokens == len(flat)


def test_save_load_roundtrip(spark, docs, model, tmp_path):
    path = str(tmp_path / "wp")
    save_wordpiece(spark, model, path)
    back = load_wordpiece(spark, path)
    assert back == model


def test_guard(spark):
    corpus = spark.createDataFrame([Row(doc_id=1, text="ab ab")])
    with pytest.raises(DVConfigurationError, match="num_merges"):
        train_wordpiece(corpus, "text", num_merges=0)


def test_early_stop(spark):
    corpus = spark.createDataFrame([Row(doc_id=1, text="ab ab xy")])
    model = train_wordpiece(corpus, "text", num_merges=50, min_pair_count=1)
    # alphabet (a, ##b, x, ##y) + at most 2 products, early-stopped
    products = [p for p in model["vocab"] if len(p.replace(CONT, "")) > 1]
    assert 0 < len(products) < 50


def test_encode_plan_no_python_and_vocab_sized(spark, docs, model):
    """The encode plan carries no Python stages and the greedy matcher
    subtree hangs off the DISTINCT-words aggregate, not the corpus."""
    from mallarddv_spark.plans.audit import plan_report

    out = wordpiece_encode(docs, "doc_id", "text", model)
    rep = plan_report(out)
    assert rep["python_stages"] == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
