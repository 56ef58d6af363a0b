"""Passage index + MaxP/SumP doc aggregation (ops/passage.py) vs an
OracleIndex built over the SAME brute-force chunks."""

import numpy as np
import pytest

from mircv_ray.oracle import OracleIndex


def _docs(n=60, seed=13):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        toks = []
        for _ in range(int(rng.integers(5, 60))):
            r = rng.random()
            toks.append("hot" if r < 0.3 else
                        "warm" if r < 0.4 else f"w{rng.integers(40)}")
        rows.append((i, " ".join(toks)))
    return rows


def _brute_chunks(rows, size, stride):
    out = []
    for doc_id, text in rows:
        toks = text.split()
        for cid, start in enumerate(range(0, len(toks), stride)):
            out.append((doc_id, cid, " ".join(toks[start:start + size])))
    return out


SIZE, STRIDE = 12, 7
QUERIES = [["hot", "w3"], ["warm"], ["hot", "warm", "w1"], ["zzz"]]


@pytest.fixture(scope="module")
def passage_setup(ray_session, tmp_path_factory):
    import ray.data as rd

    from mircv_ray.ops import build_passage_index
    rows = _docs()
    out = str(tmp_path_factory.mktemp("pidx"))
    import pyarrow as pa
    tbl = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string())})
    build_passage_index(rd.from_arrow(tbl), out, size=SIZE, stride=STRIDE)
    chunks = _brute_chunks(rows, SIZE, STRIDE)
    oracle = OracleIndex.build(
        [{"repo": "p", "path": f"{d:012d}-{c:06d}", "content": t}
         for d, c, t in chunks], parse=False, squeeze=False)
    chunk_doc = [d for d, _, _ in sorted((d, c, t) for d, c, t in chunks)]
    return out, oracle, chunk_doc


def _brute_maxp(oracle, chunk_doc, terms, k=10, standard="BM25",
                agg="max"):
    res = oracle.score_query(terms, standard=standard, k=10 ** 9)
    per_doc: dict = {}
    for chunk_docid, score in res:
        d = chunk_doc[chunk_docid - 1]
        if agg == "max":
            per_doc[d] = max(per_doc.get(d, -np.inf), score)
        else:
            per_doc[d] = per_doc.get(d, 0.0) + score
    ranked = sorted(per_doc.items(), key=lambda t: (-t[1], t[0]))
    return ranked[:k]


@pytest.mark.parametrize("standard", ["BM25", "TFIDF"])
@pytest.mark.parametrize("agg", ["max", "sum"])
def test_maxp_vs_brute_force(passage_setup, standard, agg):
    from mircv_ray.ops import passage_topk_maxp
    out, oracle, chunk_doc = passage_setup
    got = passage_topk_maxp(out, QUERIES, k=10, standard=standard,
                            agg=agg).to_pylist()
    for qid, terms in enumerate(QUERIES):
        g = [(r["doc_id"], r["score"]) for r in got if r["qid"] == qid]
        exp = _brute_maxp(oracle, chunk_doc, terms, k=10,
                          standard=standard, agg=agg)
        assert [d for d, _ in g] == [d for d, _ in exp], (standard, agg,
                                                          qid, g, exp)
        for (gd, gs), (ed, es) in zip(g, exp):
            assert gs == pytest.approx(es, rel=1e-9), (standard, agg, gd)


def test_chunk_meta_row_order_is_docno_order(passage_setup):
    import pyarrow.parquet as pq
    out, oracle, chunk_doc = passage_setup
    meta = pq.read_table(f"{out}/chunk_meta")
    assert meta["doc_id"].to_pylist() == chunk_doc
    # sidecar rows are (doc_id, chunk_id)-sorted
    pairs = list(zip(meta["doc_id"].to_pylist(),
                     meta["chunk_id"].to_pylist()))
    assert pairs == sorted(pairs)


def test_agg_validation(passage_setup):
    from mircv_ray.ops import passage_topk_maxp
    out, _, _ = passage_setup
    with pytest.raises(ValueError, match="agg"):
        passage_topk_maxp(out, QUERIES, agg="median")
