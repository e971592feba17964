"""One-off rich-text corpus generator for tokenizer-scale stress:
the sf* synthetic documents draw from a ~60-word vocabulary, which
saturates byte-level BPE at ~128 merges (every pre-token fully merges)
and makes realistic vocab-size training unmeasurable. This builds a
Zipf-tailed corpus with genuine SUBWORD structure instead: a ~30k-word
vocabulary composed from a few hundred syllables (so merges find real
shared fragments), Zipf-rank sampled, with sentence casing,
punctuation, digits, and contractions for the GPT-2 pre-tokenizer to
exercise. Deterministic (fixed seed). Output:
`_stress/zipf/documents.parquet` (gitignored). NOT part of any gate —
feeds tools/stress_r11.py's `bigbpe` stage.
"""
from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "_stress", "zipf")

N_DOCS = 50_000
WORDS_PER_DOC = 120
VOCAB = 30_000
ZIPF_A = 1.07  # exponent: mild tail so the 30k vocab actually appears

ONSETS = ["b", "br", "c", "ch", "cl", "d", "dr", "f", "fl", "g", "gr",
          "h", "j", "k", "l", "m", "n", "p", "pl", "pr", "qu", "r", "s",
          "sc", "sh", "sl", "sp", "st", "str", "t", "th", "tr", "v",
          "w", "z", ""]
NUCLEI = ["a", "ai", "e", "ea", "ee", "i", "ia", "o", "oa", "oo", "ou",
          "u"]
CODAS = ["", "b", "ck", "d", "g", "l", "ll", "m", "n", "nd", "ng", "nt",
         "p", "r", "rd", "rn", "s", "ss", "st", "t", "th", "x"]


def build_vocab(rng: np.random.Generator) -> list[str]:
    vocab: list[str] = []
    seen: set[str] = set()
    while len(vocab) < VOCAB:
        n_syll = int(rng.integers(1, 4))
        w = "".join(
            ONSETS[rng.integers(len(ONSETS))]
            + NUCLEI[rng.integers(len(NUCLEI))]
            + (CODAS[rng.integers(len(CODAS))] if s == n_syll - 1 else "")
            for s in range(1, n_syll + 1)
        )
        if len(w) < 2 or w in seen:
            continue
        seen.add(w)
        vocab.append(w)
    return vocab


def main() -> None:
    rng = np.random.default_rng(20260816)
    vocab = np.array(build_vocab(rng))
    # Zipf ranks: rejection-free via truncated zipf (resample > VOCAB)
    total = N_DOCS * WORDS_PER_DOC
    ranks = rng.zipf(ZIPF_A, size=int(total * 1.6))
    ranks = ranks[ranks <= VOCAB][:total]
    while len(ranks) < total:
        extra = rng.zipf(ZIPF_A, size=total)
        ranks = np.concatenate([ranks, extra[extra <= VOCAB]])[:total]
    words = vocab[ranks - 1].reshape(N_DOCS, WORDS_PER_DOC)
    docs = []
    for i in range(N_DOCS):
        row = words[i]
        parts = []
        sent_start = True
        for j, w in enumerate(row):
            if sent_start:
                w = w.capitalize()
                sent_start = False
            r = (i * 31 + j * 7) % 97
            if r < 8:  # end of sentence
                parts.append(w + ".")
                sent_start = True
            elif r < 12:
                parts.append(w + ",")
            elif r == 13:
                parts.append(w + "'s")
            elif r == 14:
                parts.append(str((i + j) % 1000))
            else:
                parts.append(w)
        docs.append(" ".join(parts))
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(N_DOCS), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }),
        os.path.join(OUT, "documents.parquet"),
    )
    n_distinct = len(set(w for d in docs[:2000] for w in d.split()))
    print(f"wrote {N_DOCS} docs, ~{n_distinct} distinct surface words "
          f"in first 2k docs, vocab {VOCAB}")


if __name__ == "__main__":
    main()
