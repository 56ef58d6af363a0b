"""WAND dynamic pruning (Broder et al., CIKM'03) — rank identity.

WAND is this engine's extension beyond the reference's MaxScore
(Scorer.java:85-162): it shares the cursors, term upper bounds and
score formulas, and because the term UBs are true bounds the pruning is
lossless — the disjunctive top-k ranking must be IDENTICAL to both
exhaustive TAAT and MaxScore on every query (same score-desc /
docId-asc ties). Scores agree to float accumulation order: WAND sums a
document's terms in UB-ascending cursor order, vectorized TAAT reduces
per term — the same value up to one ulp per add, hence the 1e-12
relative check (ids stay exact; equal-score ties are bit-identical
single-term sums, so tie order cannot flip).
"""

import numpy as np
import pyarrow as pa
import pytest

from mircv_ray.config import IndexConfig, QueryConfig


def _corpus(n=700, seed=5):
    """Skewed corpus: one mega-df term, mid terms, rare terms, so the
    pivot actually moves and nextGEQ skips blocks."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        toks = [f"rare{i % 41}"]
        if i % 2 == 0:
            toks.extend(["hot"] * int(rng.integers(1, 6)))
        if i % 5 == 0:
            toks.append("warm")
        if i % 13 == 0:
            toks.append("tepid")
        if i % 7 == 0:
            toks.append("mild")
        rows.append(" ".join(toks * 2))
    return pa.table({
        "repo": pa.array(["r"] * n),
        "path": pa.array([f"f{i:05d}" for i in range(n)]),
        "commit": pa.array(["c"] * n),
        "lang": pa.array(["py"] * n),
        "content": pa.array(rows),
    })


@pytest.fixture(scope="module")
def wand_index(ray_session, tmp_path_factory):
    import ray.data as rd

    from mircv_ray.build import build_index
    out = str(tmp_path_factory.mktemp("wandidx"))
    build_index(rd.from_arrow(_corpus()), out,
                IndexConfig(parse=False, squeeze=False, num_shards=2,
                            salt_buckets=1))
    return out


QUERIES = ["hot rare3", "hot warm tepid", "rare5 rare7 hot", "hot mild",
           "tepid warm mild", "hot warm", "rare11 tepid", "hot",
           "warm mild rare2 tepid", "rare1 rare2 rare3 rare4"]


def _canon(res):
    # engines accumulate a doc's terms in different float orders (WAND:
    # UB-ascending; MaxScore: pivot-dependent; TAAT: vectorized), so
    # exact ties can differ by an ulp and swap — canonicalize at 1e-9
    return sorted(((d, round(s, 9)) for d, s in res),
                  key=lambda t: (-t[1], int(t[0])))


def _assert_same_ranking(got, exp, ctx):
    g, e = _canon(got), _canon(exp)
    assert [d for d, _ in g] == [d for d, _ in e], (ctx, got, exp)
    for (gd, gs), (ed, es) in zip(g, e):
        assert gs == pytest.approx(es, rel=1e-9), (ctx, gd, gs, es)


@pytest.mark.parametrize("standard", ["BM25", "TFIDF"])
def test_wand_rank_identity(wand_index, standard):
    from mircv_ray.query import QueryEngine
    wd = QueryEngine(wand_index, QueryConfig(standard=standard, k=5,
                                             parse=False, squeeze=False,
                                             algo="wand"))
    ms = QueryEngine(wand_index, QueryConfig(standard=standard, k=5,
                                             parse=False, squeeze=False,
                                             algo="maxscore"))
    ta = QueryEngine(wand_index, QueryConfig(standard=standard, k=5,
                                             parse=False, squeeze=False))
    for q in QUERIES:
        w, m, t = wd.query(q), ms.query(q), ta.query(q)
        _assert_same_ranking(w, t, (standard, q, "taat"))
        _assert_same_ranking(w, m, (standard, q, "maxscore"))


def test_wand_k_sweep(wand_index):
    from mircv_ray.query import QueryEngine
    for k in (1, 3, 20, 10_000):  # k > result size: no pruning possible
        wd = QueryEngine(wand_index, QueryConfig(standard="BM25", k=k,
                                                 parse=False, squeeze=False,
                                                 algo="wand"))
        ta = QueryEngine(wand_index, QueryConfig(standard="BM25", k=k,
                                                 parse=False, squeeze=False))
        for q in QUERIES:
            _assert_same_ranking(wd.query(q), ta.query(q), (k, q))


def test_wand_respects_tombstones(ray_session, wand_index, tmp_path):
    """Deleted docs never appear, and survivors match exhaustive TAAT on
    the same tombstoned index."""
    import shutil

    from mircv_ray.build import delete_docs
    from mircv_ray.query import QueryEngine
    idx = tmp_path / "del"
    shutil.copytree(wand_index, idx)
    wd0 = QueryEngine(wand_index, QueryConfig(standard="BM25", k=50,
                                              parse=False, squeeze=False,
                                              algo="wand"))
    top = [int(d) for d, _ in wd0.query("hot warm")][:10]
    delete_docs(str(idx), [d + 1 for d in top])  # docno -> docId
    wd = QueryEngine(str(idx), QueryConfig(standard="BM25", k=10,
                                           parse=False, squeeze=False,
                                           algo="wand"))
    ta = QueryEngine(str(idx), QueryConfig(standard="BM25", k=10,
                                           parse=False, squeeze=False,
                                           algo="maxscore"))
    for q in QUERIES:
        w = wd.query(q)
        assert all(int(d) not in top for d, _ in w), q
        _assert_same_ranking(w, ta.query(q), q)


def test_wand_empty_and_unknown(wand_index):
    from mircv_ray.query import QueryEngine
    wd = QueryEngine(wand_index, QueryConfig(standard="BM25", k=10,
                                             parse=False, squeeze=False,
                                             algo="wand"))
    assert wd.query("zzzunknownzzz") == []
