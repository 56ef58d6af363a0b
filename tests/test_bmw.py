"""Block-Max WAND (Ding & Suel SIGIR'11) — lossless pruning checks.

BMW refines WAND's pivot with the per-block score bounds the index
stores for block-max MaxScore. Rankings must be identical to WAND /
MaxScore / TAAT; the shallow check must provably SKIP full scorings.
"""

import numpy as np
import pyarrow as pa
import pytest

from mircv_ray.config import IndexConfig, QueryConfig
from mircv_ray.query.cursors import EXHAUSTED
from mircv_ray.query.scorer import block_max_wand, wand


class BlockMockCursor:
    """Mock with real block structure: block_max = last docId per block,
    block_ubs = max score per block (true bounds, like the index)."""

    def __init__(self, postings, block=4):
        self.p = postings
        self.i = 0
        docs = np.array([d for d, _ in postings], dtype=np.int64)
        scores = np.array([s for _, s in postings])
        bs = range(0, len(docs), block)
        self.block_max = np.array([docs[min(i + block - 1, len(docs) - 1)]
                                   for i in bs], dtype=np.int64)
        self.block_ubs = np.array([scores[i:i + block].max() for i in bs])
        self.term_ub = float(scores.max())
        self.scored = 0

    def doc_id(self):
        return self.p[self.i][0] if self.i < len(self.p) else EXHAUSTED

    def next(self):
        self.i += 1

    def next_geq(self, t):
        while self.i < len(self.p) and self.p[self.i][0] < t:
            self.i += 1

    def ub_at(self, target):
        if self.i >= len(self.p):
            return 0.0
        bi = int(np.searchsorted(self.block_max, target))
        if bi >= len(self.block_max):
            return 0.0
        return float(self.block_ubs[bi])

    def score(self):
        self.scored += 1
        return self.p[self.i][1]


def _mk_sides(rng, nterms=4, ndocs=300):
    cursors = []
    for _ in range(nterms):
        docs = np.sort(rng.choice(np.arange(1, ndocs), size=rng.integers(
            10, ndocs // 2), replace=False))
        posts = [(int(d), float(np.round(rng.uniform(0.01, 3.0), 6)))
                 for d in docs]
        cursors.append(BlockMockCursor(posts, block=int(rng.integers(2, 9))))
    return cursors


def _brute(cursors, k):
    acc = {}
    for c in cursors:
        for d, s in c.p:
            acc[d] = acc.get(d, 0.0) + s
    return sorted(acc.items(), key=lambda t: (-t[1], t[0]))[:k]


def test_bmw_fuzz_vs_brute_force():
    rng = np.random.default_rng(17)
    for trial in range(300):
        cursors = _mk_sides(rng, nterms=int(rng.integers(1, 6)))
        k = int(rng.choice([1, 3, 10]))
        got = block_max_wand(cursors, k, lambda c: c.score())
        exp = _brute(cursors, k)
        # scores from single adds per term are order-independent here
        assert [(d, round(s, 9)) for d, s in got] == \
            [(d, round(s, 9)) for d, s in exp], trial


def test_bmw_scores_fewer_docs_than_wand():
    """The shallow check must avoid full scorings WAND performs: over
    many skewed instances, BMW's total score_fn calls are never more,
    and strictly fewer in aggregate."""
    rng = np.random.default_rng(23)
    total_w = total_b = 0
    for _ in range(40):
        # skewed: one dense high-scoring list + sparse weak ones makes
        # many pivots fail the shallow test inside low blocks
        dense = [(d, float(np.round(rng.uniform(2.0, 3.0), 6)))
                 for d in range(1, 250)]
        sides_w = [BlockMockCursor(dense, block=8)]
        sides_b = [BlockMockCursor(dense, block=8)]
        for _ in range(3):
            docs = np.sort(rng.choice(np.arange(1, 250), size=25,
                                      replace=False))
            posts = [(int(d), float(np.round(rng.uniform(0.01, 0.3), 6)))
                     for d in docs]
            sides_w.append(BlockMockCursor(posts, block=4))
            sides_b.append(BlockMockCursor(list(posts), block=4))
        rw = wand(sides_w, 5, lambda c: c.score())
        rb = block_max_wand(sides_b, 5, lambda c: c.score())
        assert [(d, round(s, 9)) for d, s in rw] == \
            [(d, round(s, 9)) for d, s in rb]
        total_w += sum(c.scored for c in sides_w)
        total_b += sum(c.scored for c in sides_b)
    assert total_b <= total_w
    assert total_b < total_w  # pruning must actually fire somewhere


def _hot_corpus(n=900):
    """Multi-block shape (like test_round2_fixes): 'hot' in 2/3 of docs
    with docId-varying tf so per-block cores differ."""
    rows = []
    for i in range(n):
        toks = [f"rare{i % 37}"]
        if i % 3 != 0:
            toks.extend(["hot"] * (8 if i < 100 else 1))
        if i % 3 == 0:
            toks.append("warm")
        if i % 11 == 0:
            toks.append("tepid")
        rows.append(" ".join(toks * 3))
    return pa.table({
        "repo": pa.array(["r"] * n),
        "path": pa.array([f"f{i:05d}" for i in range(n)]),
        "commit": pa.array(["c"] * n),
        "lang": pa.array(["py"] * n),
        "content": pa.array(rows),
    })


@pytest.fixture(scope="module")
def bmw_index(ray_session, tmp_path_factory):
    import ray.data as rd

    from mircv_ray.build import build_index
    out = str(tmp_path_factory.mktemp("bmwidx"))
    build_index(rd.from_arrow(_hot_corpus()), out,
                IndexConfig(parse=False, squeeze=False, num_shards=2,
                            salt_buckets=1))
    return out


@pytest.mark.parametrize("standard", ["BM25", "TFIDF"])
def test_bmw_rank_identity_real_index(bmw_index, standard):
    from mircv_ray.query import QueryEngine

    def canon(res):
        return sorted(((d, round(s, 9)) for d, s in res),
                      key=lambda t: (-t[1], int(t[0])))

    engines = {a: QueryEngine(bmw_index, QueryConfig(
        standard=standard, k=5, parse=False, squeeze=False, algo=a))
        for a in ("bmw", "wand", "maxscore", "auto")}
    for q in ["hot rare3", "hot warm tepid", "rare5 rare7 hot",
              "hot rare9", "tepid warm", "hot warm", "hot"]:
        res = {a: canon(e.query(q)) for a, e in engines.items()}
        for a in ("wand", "maxscore", "auto"):
            assert [d for d, _ in res["bmw"]] == [d for d, _ in res[a]], \
                (standard, q, a, res)
            for (gd, gs), (ed, es) in zip(res["bmw"], res[a]):
                assert gs == pytest.approx(es, rel=1e-9)


def test_bmw_respects_tombstones(ray_session, bmw_index, tmp_path):
    import shutil

    from mircv_ray.build import delete_docs
    from mircv_ray.query import QueryEngine
    idx = tmp_path / "del"
    shutil.copytree(bmw_index, idx)
    base = QueryEngine(bmw_index, QueryConfig(standard="BM25", k=50,
                                              parse=False, squeeze=False,
                                              algo="bmw"))
    top = [int(d) for d, _ in base.query("hot warm")][:10]
    delete_docs(str(idx), [d + 1 for d in top])
    eng = QueryEngine(str(idx), QueryConfig(standard="BM25", k=10,
                                            parse=False, squeeze=False,
                                            algo="bmw"))
    ms = QueryEngine(str(idx), QueryConfig(standard="BM25", k=10,
                                           parse=False, squeeze=False,
                                           algo="maxscore"))
    for q in ["hot warm", "hot rare3", "tepid warm"]:
        got = eng.query(q)
        assert all(int(d) not in top for d, _ in got)
        assert [d for d, _ in got] == [d for d, _ in ms.query(q)]
