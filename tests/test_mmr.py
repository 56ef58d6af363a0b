"""MMR diversified reranking (Carbonell & Goldstein SIGIR'98) vs brute
force: greedy lam*sim(q,d) - (1-lam)*max sim(d, selected) over the
cosine top-n_cand candidate set, ties (mmr desc, vec_id asc)."""

import numpy as np
import pyarrow as pa
import pytest


def _emb_table(n=80, dim=12, seed=3):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, dim))
    # planted near-dup pairs so diversification visibly reorders
    for i in range(0, min(20, n - 1), 2):
        m[i + 1] = m[i] + rng.normal(scale=0.01, size=dim)
    return pa.table({
        "vec_id": pa.array(np.arange(n), type=pa.int64()),
        "embedding": pa.array([row.astype(np.float32).tolist()
                               for row in m]),
    }), m


def _brute_mmr(m, qvecs, k, lam, n_cand):
    def norm(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)
    # the table stores float32; the engine reads those back as float64
    mn = norm(m.astype(np.float32).astype(np.float64))
    out = []
    for qi, q in enumerate(norm(np.asarray(qvecs, dtype=np.float64))):
        sims = mn @ q
        order = np.lexsort((np.arange(len(mn)), -sims))[:n_cand]
        ids = np.sort(order)                   # candidate order by id
        rel = sims[ids]
        Eq = mn[ids]
        picked = np.zeros(len(ids), dtype=bool)
        maxdiv = np.zeros(len(ids))
        for rank in range(1, min(k, len(ids)) + 1):
            mmr = lam * rel - (1.0 - lam) * maxdiv
            mmr[picked] = -np.inf
            best = int(np.lexsort((ids, -mmr))[0])
            picked[best] = True
            out.append((qi, rank, int(ids[best]), float(mmr[best])))
            maxdiv = np.maximum(maxdiv, Eq @ Eq[best])
    return out


@pytest.mark.parametrize("lam,k,n_cand", [(0.7, 5, 20), (0.3, 8, 15),
                                          (1.0, 5, 10), (0.0, 3, 10)])
def test_mmr_vs_brute_force(ray_session, lam, k, n_cand):
    import ray.data as rd

    from mircv_ray.ops import mmr_rerank
    tbl, m = _emb_table()
    qvecs = m[:3]
    got = mmr_rerank(rd.from_arrow(tbl), qvecs, k=k, lam=lam,
                     n_cand=n_cand).to_pylist()
    exp = _brute_mmr(m, qvecs, k, lam, n_cand)
    assert len(got) == len(exp)
    for g, (qi, rank, vid, score) in zip(got, exp):
        assert (g["query_id"], g["rank"], g["vec_id"]) == (qi, rank, vid)
        assert g["score"] == pytest.approx(score, rel=1e-9)


def test_mmr_lam1_is_cosine_topk(ray_session):
    """lam=1 ignores diversity: picks = plain cosine top-k in order."""
    import ray.data as rd

    from mircv_ray.ops import cosine_topk, mmr_rerank
    tbl, m = _emb_table()
    qvecs = m[:2]
    ds = rd.from_arrow(tbl)
    got = mmr_rerank(ds, qvecs, k=5, lam=1.0, n_cand=20).to_pylist()
    top = cosine_topk(ds, qvecs, k=5).to_pandas()
    for qi in (0, 1):
        g = [r["vec_id"] for r in got if r["query_id"] == qi]
        t = top[top["query_id"] == qi]["vec_id"].tolist()
        assert g == t, qi


def test_mmr_diversifies_planted_dups(ray_session):
    """With a near-dup of the best hit in the pool, low-lam MMR must NOT
    pick both in the top ranks (plain cosine does)."""
    import ray.data as rd

    from mircv_ray.ops import cosine_topk, mmr_rerank
    tbl, m = _emb_table()
    ds = rd.from_arrow(tbl)
    q = m[0:1]  # vec 1 is a planted near-dup of vec 0
    top = cosine_topk(ds, q, k=2).to_pandas()["vec_id"].tolist()
    assert set(top) == {0, 1}  # cosine takes the dup pair
    got = mmr_rerank(ds, q, k=2, lam=0.5, n_cand=20).to_pylist()
    picked = [r["vec_id"] for r in got]
    assert picked[0] == 0 and picked[1] != 1, picked


def test_mmr_validation(ray_session):
    import ray.data as rd

    from mircv_ray.ops import mmr_rerank
    tbl, m = _emb_table(n=10)
    ds = rd.from_arrow(tbl)
    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(ds, m[:1], lam=1.5)
    with pytest.raises(ValueError, match="n_cand"):
        mmr_rerank(ds, m[:1], k=30, n_cand=10)


# ------------------------ Rocchio dense PRF (embedding-space feedback)

def _brute_rocchio(m, qvecs, k, alpha, beta, n_fb):
    def norm(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)
    raw = m.astype(np.float32).astype(np.float64)
    mn = norm(raw)
    out = []
    for qi, q in enumerate(np.asarray(qvecs, dtype=np.float64)):
        sims = mn @ (q / np.linalg.norm(q))
        fb = np.lexsort((np.arange(len(mn)), -sims))[:n_fb]
        q2 = alpha * q + beta * raw[np.sort(fb)].mean(axis=0)
        sims2 = mn @ (q2 / np.linalg.norm(q2))
        top = np.lexsort((np.arange(len(mn)), -sims2))[:k]
        out += [(qi, int(d), float(sims2[d])) for d in top]
    return out


@pytest.mark.parametrize("alpha,beta,n_fb", [(1.0, 0.75, 5), (0.5, 1.0, 3),
                                             (1.0, 0.0, 2)])
def test_rocchio_vs_brute_force(ray_session, alpha, beta, n_fb):
    import ray.data as rd

    from mircv_ray.ops import rocchio_dense
    tbl, m = _emb_table()
    qv = m[:3]
    got = rocchio_dense(rd.from_arrow(tbl), qv, k=8, alpha=alpha,
                        beta=beta, n_fb=n_fb).to_pandas()
    got = got.sort_values(["query_id", "score", "vec_id"],
                          ascending=[True, False, True])
    exp = _brute_rocchio(m, qv, 8, alpha, beta, n_fb)
    rows = list(zip(got["query_id"], got["vec_id"], got["score"]))
    assert [(q, d) for q, d, _ in rows] == [(q, d) for q, d, _ in exp]
    for (_, _, gs), (_, _, es) in zip(rows, exp):
        assert gs == pytest.approx(es, rel=1e-9)


def test_rocchio_beta_zero_is_plain_topk(ray_session):
    import ray.data as rd

    from mircv_ray.ops import cosine_topk, rocchio_dense
    tbl, m = _emb_table()
    ds = rd.from_arrow(tbl)
    qv = m[:2]
    a = rocchio_dense(ds, qv, k=5, alpha=2.0, beta=0.0).to_pandas()
    b = cosine_topk(ds, qv, k=5).to_pandas()
    # scaling q never changes cosine ranking
    assert a["vec_id"].tolist() == b["vec_id"].tolist()


def test_rocchio_validation(ray_session):
    import ray.data as rd

    from mircv_ray.ops import rocchio_dense
    tbl, m = _emb_table(n=10)
    with pytest.raises(ValueError, match="n_fb"):
        rocchio_dense(rd.from_arrow(tbl), m[:1], n_fb=0)
