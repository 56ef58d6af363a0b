"""Federated scatter-gather search (query/federated.py): with global
statistics, a partitioned corpus returns EXACTLY the monolithic
index's ranking."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from mircv_ray.config import IndexConfig, QueryConfig
from mircv_ray.sources import generate_corpus_table

CFG = dict(parse=True, num_shards=4, salt_buckets=2)
QUERIES = [["def", "return", "value"], ["hash", "map", "def", "def"],
           ["zz_nothing_matches"]]


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    import ray.data as rd
    from mircv_ray.build import build_index
    root = tmp_path_factory.mktemp("fed")
    table = generate_corpus_table(90, seed=21).drop_columns(["sha256"])
    table = table.take(pc.sort_indices(
        table, sort_keys=[("repo", "ascending"), ("path", "ascending")]))
    mono = str(root / "mono")
    build_index(rd.from_arrow(table), mono, IndexConfig(**CFG))
    # split rows 3 ways by row index (disjoint cover, unequal sizes)
    parts = [table.slice(0, 20), table.slice(20, 45),
             table.slice(65)]
    dirs = []
    for i, part in enumerate(parts):
        d = str(root / f"sub{i}")
        build_index(rd.from_arrow(part), d, IndexConfig(**CFG))
        dirs.append(d)
    return mono, dirs, table


def _gid_fn_for(mono_docs_paths):
    """Map a sub-index's local docnos to the MONOLITHIC docnos via the
    (repo, path) key — the generic global-id hook."""
    lut = {rp: i for i, rp in enumerate(mono_docs_paths)}

    def gid(index_dir: str) -> np.ndarray:
        import pyarrow.parquet as pq
        t = pq.read_table(f"{index_dir}/docs",
                          columns=["doc_id", "repo", "path"])
        order = np.argsort(t["doc_id"].to_numpy())
        rps = list(zip(t["repo"].to_pylist(), t["path"].to_pylist()))
        return np.array([lut[rps[i]] for i in order], dtype=np.int64)
    return gid


def test_federated_equals_monolithic_exactly(ray_session, setup):
    import pyarrow.parquet as pq
    from mircv_ray.query import QueryEngine
    from mircv_ray.query.federated import federated_topk
    mono, dirs, table = setup
    md = pq.read_table(f"{mono}/docs", columns=["doc_id", "repo", "path"])
    order = np.argsort(md["doc_id"].to_numpy())
    mono_paths = [ (md["repo"].to_pylist()[i], md["path"].to_pylist()[i])
                   for i in order ]
    fed = federated_topk(dirs, QUERIES, k=10,
                         global_ids=_gid_fn_for(mono_paths))
    eng = QueryEngine(mono, QueryConfig(standard="BM25", k=10))
    exp_rows = []
    for qi, terms in enumerate(QUERIES):
        for did, sc in eng.score_terms(list(terms)):
            exp_rows.append((qi, did - 1, sc))
    got_rows = list(zip(fed["qid"].to_pylist(), fed["doc_id"].to_pylist(),
                        fed["score"].to_pylist()))
    assert got_rows == exp_rows          # bit-exact scores AND order


def test_validation(ray_session, setup):
    from mircv_ray.query.federated import federated_topk
    _, dirs, _ = setup
    with pytest.raises(ValueError, match="non-empty"):
        federated_topk([], QUERIES)
    with pytest.raises(ValueError, match="k must"):
        federated_topk(dirs, QUERIES, k=0)
