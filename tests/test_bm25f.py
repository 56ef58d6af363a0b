"""BM25F field-weighted ranking vs a pure-Python brute force.

Each field is a standard index built over that field's corpus view;
the title view is the body's first-40-chars slice, so truncation can
create fragment terms that exist ONLY in the title field, and an
all-whitespace title drops its doc from the title index entirely —
both paths the brute force must agree on.
"""

import math

import numpy as np
import pytest

from mircv_ray.config import IndexConfig
from mircv_ray.query.bm25f import bm25f_topk

VOCAB = ["alpha", "beta", "gamma", "delta", "hot", "cold", "warm",
         "zig", "zag", "longwordthatgetscutbythetitleslice"]


def _corpus(n=90, seed=4):
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n):
        toks = [VOCAB[int(j)] for j in rng.integers(0, len(VOCAB),
                                                    rng.integers(3, 14))]
        texts.append(" ".join(toks))
    # doc whose title (first 40 chars) is all whitespace
    texts[7] = " " * 41 + "alpha beta hot"
    # doc where the 40-char cut splits a word -> title-only fragment
    texts[11] = "zig zag hot cold warm alpha beta gamma delta hot"
    return texts


def _rows(texts):
    return [{"repo": "r", "path": f"doc_{i:08d}.txt", "commit": "c",
             "lang": "py", "content": t} for i, t in enumerate(texts)]


@pytest.fixture(scope="module")
def bm25f_indexes(ray_session, tmp_path_factory):
    import ray.data as rd

    from mircv_ray.build import build_index
    texts = _corpus()
    cfg = IndexConfig(parse=False, squeeze=False, num_shards=2,
                      salt_buckets=1)
    body = str(tmp_path_factory.mktemp("f_body"))
    title = str(tmp_path_factory.mktemp("f_title"))
    build_index(rd.from_items(_rows(texts)), body, cfg)
    build_index(rd.from_items(_rows([t[:40] for t in texts])), title, cfg)
    return texts, body, title


def _brute(texts, queries, w_t, b_b, b_t, k1, k=10):
    """Pure-Python BM25F over (body, title=first-40-chars)."""
    fields = []
    for view in (texts, [t[:40] for t in texts]):
        toks = {i: view[i].split() for i in range(len(view))
                if view[i].strip()}
        dl = {i: len(v) for i, v in toks.items()}
        avg = sum(dl.values()) / len(dl)
        tf = {}
        for i, v in toks.items():
            for t in v:
                tf.setdefault(t, {}).setdefault(i, 0)
                tf[t][i] += 1
        fields.append((tf, dl, avg))
    n = len(texts)
    weights = [1.0, w_t]
    bs = [b_b, b_t]
    results = {}
    for qid, terms in queries:
        acc = {}
        for t in terms:
            cand = set()
            for tf, _, _ in fields:
                cand |= set(tf.get(t, {}))
            if not cand:
                continue
            idf = math.log10(n / len(cand))
            for d in cand:
                tfx = 0.0
                for (tf, dl, avg), w, b in zip(fields, weights, bs):
                    c = tf.get(t, {}).get(d, 0)
                    if c:
                        bfd = (1.0 - b) + b * (dl[d] / avg)
                        tfx += w * c / bfd
                acc[d] = acc.get(d, 0.0) + tfx / (k1 + tfx) * idf
        top = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        results[qid] = top
    return results


QUERIES = [
    (0, ["hot", "alpha"]),
    (1, ["zig", "zag", "cold"]),
    (2, ["hot", "hot"]),                       # duplicate scores twice
    (3, ["longwordthatgetscutbythetitleslice"]),
    (4, ["longwordthatgetscutbythetitlesli"]),  # title-only fragment
    (5, ["nosuchterm"]),
    (6, ["warm"]),
]


@pytest.mark.parametrize("w_t,b_b,b_t,k1", [
    (2.0, 0.75, 0.5, 1.5),
    (1.0, 0.75, 0.75, 1.5),
    (4.0, 0.25, 0.0, 1.2),
    (0.0, 0.5, 0.5, 1.5),                      # title weight 0 == plain body
])
def test_bm25f_vs_brute_force(bm25f_indexes, w_t, b_b, b_t, k1):
    texts, body, title = bm25f_indexes
    got = bm25f_topk([(body, 1.0, b_b), (title, w_t, b_t)],
                     QUERIES, k1=k1, k=10)
    exp = _brute(texts, QUERIES, w_t, b_b, b_t, k1)
    by_qid: dict = {}
    for qid, path, score in got:
        by_qid.setdefault(qid, []).append((int(path[4:12]), score))
    assert set(by_qid) == {q for q, r in exp.items() if r}
    for qid, rows in by_qid.items():
        assert [d for d, _ in rows] == [d for d, _ in exp[qid]], qid
        for (gd, gs), (ed, es) in zip(rows, exp[qid]):
            assert gs == pytest.approx(es, rel=1e-12), (qid, gd)


def test_title_fragment_is_title_only(bm25f_indexes):
    texts, body, title = bm25f_indexes
    # the fragment produced by the 40-char cut of doc 11 must match in
    # the title index and not in the body index
    frag = texts[11][:40].split()[-1]
    assert frag not in texts[11].split()
    got = bm25f_topk([(body, 1.0, 0.75), (title, 2.0, 0.5)],
                     [(0, [frag])], k=10)
    assert any(int(p[4:12]) == 11 for _, p, _ in got)


def test_validation(bm25f_indexes):
    _, body, _ = bm25f_indexes
    with pytest.raises(ValueError):
        bm25f_topk([], [])
    with pytest.raises(ValueError):
        bm25f_topk([(body, -1.0, 0.5)], [])
    with pytest.raises(ValueError):
        bm25f_topk([(body, 1.0, 1.5)], [])
