"""Gopher n-gram repetition fractions: parity vs a pure-Python brute
force over handcrafted and random corpora."""
import math
import re

import numpy as np
import pyarrow as pa

from mircv_ray.ops import ngram_repetition_stats


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


def _r4(x):
    return math.trunc(x * 1e4 + math.copysign(0.5, x)) / 1e4


def _brute(text, top_ns=(2, 3, 4), dup_ns=(5, 6, 7, 8, 9, 10)):
    toks = _toks(text)
    lens = [len(t) for t in toks]
    tot = sum(lens)
    denom = max(tot, 1)
    row = {"n_token_chars": tot}
    for n in top_ns:
        grams = {}
        for s in range(len(toks) - n + 1):
            g = tuple(toks[s:s + n])
            grams[g] = grams.get(g, 0) + 1
        best = max((c * sum(map(len, g)) for g, c in grams.items()),
                   default=0)
        row[f"top_{n}gram_char_frac"] = _r4(best / denom)
    for n in dup_ns:
        seen, cov = set(), set()
        for s in range(len(toks) - n + 1):
            g = tuple(toks[s:s + n])
            if g in seen:
                cov.update(range(s, s + n))
            seen.add(g)
        row[f"dup_{n}gram_char_frac"] = _r4(
            sum(lens[i] for i in cov) / denom)
    return row


DOCS = [
    (0, "spam ham spam ham spam ham eggs"),         # heavy 2-gram
    (1, "a b c d e a b c d e a b c d e tail"),      # dup 5-grams
    (2, "all tokens unique here today friend ok"),  # nothing repeats
    (3, "x " * 12),                                 # one token repeated
    (4, "one two three four five six seven eight nine ten "
        "one two three four five six seven eight nine ten"),  # dup 10
    (5, ""),
    (6, None),
    (7, "Mixed-CASE punct!! splits;; like the ORACLE's regexp does"),
]


def _run(docs):
    batch = pa.table({
        "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
        "text": pa.array([t for _, t in docs], type=pa.string()),
    })
    return ngram_repetition_stats(batch)


def test_ngram_repetition_equals_brute_force():
    out = _run(DOCS)
    for i, (_, text) in enumerate(DOCS):
        exp = _brute(text)
        for col, v in exp.items():
            got = out[col][i].as_py()
            assert got == v or abs(got - v) < 1e-12, (i, col, got, v)
    # spot semantics: doc 0's best 2-gram is 'spam ham' x3 = 21 chars of
    # 25 total; doc 4 repeats its whole 10-token half
    assert out["top_2gram_char_frac"][0].as_py() == _r4(21 / 25)
    assert out["dup_10gram_char_frac"][4].as_py() > 0.49
    # doc 2: nothing repeats -> every dup frac zero (top fracs carry
    # the count-1 gram's own chars by the documented max-product rule)
    for col in out.column_names[2:]:
        if col.startswith("dup_"):
            assert out[col][2].as_py() == 0.0
        assert out[col][5].as_py() == 0.0  # empty doc
        assert out[col][6].as_py() == 0.0  # null doc


def test_ngram_repetition_random_corpus():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    for d in range(40):
        n = int(rng.integers(0, 30))
        docs.append((d, " ".join(rng.choice(vocab, size=n))))
    out = _run(docs)
    for i, (_, text) in enumerate(docs):
        exp = _brute(text)
        for col, v in exp.items():
            got = out[col][i].as_py()
            assert got == v or abs(got - v) < 1e-12, (i, col, got, v)


def test_ngram_repetition_overlapping_coverage_counts_once():
    # 'a a a a a a a' (7 tokens): 5-grams at s=0,1,2; s=1,2 are dups of
    # s=0 and together cover positions 1..6 -> 6 of 7 chars
    out = _run([(0, "a a a a a a a")])
    assert out["dup_5gram_char_frac"][0].as_py() == _r4(6 / 7)
