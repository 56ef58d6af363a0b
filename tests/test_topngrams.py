"""top_ngrams: corpus-wide most-frequent word n-grams
(ops/topngrams.py) vs a pure-Python brute force."""

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from mircv_ray.ops import top_ngrams

RX = re.compile(r"[^a-z0-9]+")


def _brute(texts, n, k, min_count=1):
    cnt = Counter()
    for t in texts:
        toks = [w for w in RX.split((t or "").lower()) if w]
        for i in range(len(toks) - n + 1):
            cnt[" ".join(toks[i:i + n])] += 1
    rows = sorted(((g, c) for g, c in cnt.items() if c >= min_count),
                  key=lambda gc: (-gc[1], gc[0]))[:k]
    return rows


def _docs(seed=11, n_docs=120):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for i in range(n_docs):
        toks = rng.choice(vocab, rng.integers(0, 40)).tolist()
        texts.append(" ".join(toks) + (". End-Of! doc" if i % 7 == 0
                                       else ""))
    texts.append(None)
    texts.append("   ")
    return pa.table({"doc_id": pa.array(range(len(texts)),
                                        type=pa.int64()),
                     "text": pa.array(texts, type=pa.string())})


class TestTopNgrams:
    @pytest.mark.parametrize("n,parts", [(1, 1), (2, 7), (3, 1), (3, 7)])
    def test_matches_brute_force(self, ray_session, n, parts):
        import ray.data as rd
        tbl = _docs()
        out = (top_ngrams(rd.from_arrow(tbl).repartition(parts), n=n, k=25)
               .to_pandas().sort_values("ngram_rank")
               .reset_index(drop=True))
        exp = _brute(tbl["text"].to_pylist(), n, 25)
        assert list(zip(out.ngram, out.ngram_count)) == exp
        assert list(out.ngram_rank) == list(range(1, len(exp) + 1))

    def test_grams_never_cross_docs(self, ray_session):
        import ray.data as rd
        tbl = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                        "text": pa.array(["aa bb", "cc dd"])})
        out = top_ngrams(rd.from_arrow(tbl), n=2, k=10).to_pandas()
        assert set(out.ngram) == {"aa bb", "cc dd"}   # never "bb cc"

    def test_min_count_cut(self, ray_session):
        import ray.data as rd
        tbl = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                        "text": pa.array(["x y x y", "x y z"])})
        out = top_ngrams(rd.from_arrow(tbl), n=2, k=10,
                         min_count=2).to_pandas()
        exp = _brute(tbl["text"].to_pylist(), 2, 10, min_count=2)
        assert list(zip(out.ngram, out.ngram_count)) == exp
        assert (out.ngram_count >= 2).all()

    def test_empty_and_validation(self, ray_session):
        import ray.data as rd
        tbl = pa.table({"doc_id": pa.array([0], type=pa.int64()),
                        "text": pa.array([""], type=pa.string())})
        assert top_ngrams(rd.from_arrow(tbl), n=2, k=5).count() == 0
        with pytest.raises(ValueError):
            top_ngrams(rd.from_arrow(tbl), n=0)
        with pytest.raises(ValueError):
            top_ngrams(rd.from_arrow(tbl), k=0)
        with pytest.raises(ValueError):
            top_ngrams(rd.from_arrow(tbl), min_count=0)
