"""Query-likelihood Dirichlet (QLD) ranking — engine vs brute force.

QLD (Zhai & Lafferty, SIGIR'01) is this engine's third scoring standard
beyond the reference's BM25/TFIDF (Scorer.java:26-43). The engine path
(`QueryEngine._score_terms_qld`) is candidate-set-sized (no dense
accumulator) and must match the pure-Python OracleIndex brute force on
ranking and scores.
"""

import numpy as np
import pyarrow as pa
import pytest

from mircv_ray.config import IndexConfig, QueryConfig
from mircv_ray.oracle import OracleIndex


def _corpus(n=400, seed=9):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        toks = [f"rare{i % 29}"]
        if i % 2 == 0:
            toks.extend(["hot"] * int(rng.integers(1, 5)))
        if i % 5 == 0:
            toks.append("warm")
        if i % 11 == 0:
            toks.append("tepid")
        # length skew so the Dirichlet doc-length prior actually moves ranks
        rows.append(" ".join(toks * int(rng.integers(1, 6))))
    return [{"repo": "r", "path": f"f{i:05d}", "commit": "c", "lang": "py",
             "content": rows[i]} for i in range(n)]


@pytest.fixture(scope="module")
def qld_pair(ray_session, tmp_path_factory):
    import ray.data as rd

    from mircv_ray.build import build_index
    rows = _corpus()
    out = str(tmp_path_factory.mktemp("qldidx"))
    build_index(rd.from_items(rows), out,
                IndexConfig(parse=False, squeeze=False, num_shards=2,
                            salt_buckets=1))
    oracle = OracleIndex.build(rows, parse=False, squeeze=False)
    return out, oracle


QUERIES = ["hot rare3", "hot warm tepid", "rare5 rare7 hot", "warm",
           "tepid warm hot hot", "rare1 rare2 rare3", "hot zzzunknown",
           "zzzunknown", "hot"]


@pytest.mark.parametrize("mu", [2000.0, 100.0, 10.0])
def test_qld_vs_brute_force(qld_pair, mu):
    from mircv_ray.query import QueryEngine
    out, oracle = qld_pair
    eng = QueryEngine(out, QueryConfig(standard="QLD", mu=mu, k=10,
                                       parse=False, squeeze=False))
    for q in QUERIES:
        got = eng.score_terms(q.split())
        exp = oracle.score_query_qld(q.split(), mu=mu, k=10)
        assert [d for d, _ in got] == [d for d, _ in exp], (mu, q, got, exp)
        for (gd, gs), (ed, es) in zip(got, exp):
            assert gs == pytest.approx(es, rel=1e-12), (mu, q, gd)


def test_qld_k_sweep(qld_pair):
    from mircv_ray.query import QueryEngine
    out, oracle = qld_pair
    for k in (1, 3, 10_000):
        eng = QueryEngine(out, QueryConfig(standard="QLD", k=k,
                                           parse=False, squeeze=False))
        got = eng.score_terms(["hot", "warm"])
        exp = oracle.score_query_qld(["hot", "warm"], k=k)
        assert [d for d, _ in got] == [d for d, _ in exp], k


def test_qld_conjunctive_raises(qld_pair):
    from mircv_ray.query import QueryEngine
    out, _ = qld_pair
    eng = QueryEngine(out, QueryConfig(standard="QLD", parse=False,
                                       squeeze=False))
    with pytest.raises(ValueError, match="disjunctive"):
        eng.score_terms(["hot"], conjunctive=True)


def test_qld_respects_tombstones(ray_session, qld_pair, tmp_path):
    import shutil

    from mircv_ray.build import delete_docs
    from mircv_ray.query import QueryEngine
    out, oracle = qld_pair
    idx = tmp_path / "del"
    shutil.copytree(out, idx)
    base = QueryEngine(out, QueryConfig(standard="QLD", k=30, parse=False,
                                        squeeze=False))
    top = [d for d, _ in base.score_terms(["hot", "warm"])][:8]
    delete_docs(str(idx), top)
    eng = QueryEngine(str(idx), QueryConfig(standard="QLD", k=10,
                                            parse=False, squeeze=False))
    got = eng.score_terms(["hot", "warm"])
    assert all(d not in top for d, _ in got)
    # survivors rank like the brute force with those docs dropped
    exp = [(d, s) for d, s in oracle.score_query_qld(["hot", "warm"], k=10**6)
           if d not in top][:10]
    assert [d for d, _ in got] == [d for d, _ in exp]
