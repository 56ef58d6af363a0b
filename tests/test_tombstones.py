"""Tombstone deletion + vacuum.

Pins the two-phase deletion contract:
- after delete_docs, every query path (TAAT, MaxScore loop, strict-AND)
  returns exactly the pre-delete ranking minus the deleted docs
  (collection stats unchanged until vacuum);
- dump_postings(apply_tombstones=True) is the filtered view;
- vacuum_index produces an index bit-identical to a from-scratch build
  over the surviving documents (fresh stats/idf/UBs, dense renumbering);
- tombstones accumulate, dedupe, and validate their id range.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from mircv_ray.config import IndexConfig, QueryConfig
from mircv_ray.sources import generate_corpus_table

N_DOCS = 150
CFG = IndexConfig(parse=True, codec="vbyte", num_shards=4, salt_buckets=2)
DELETED = list(range(3, N_DOCS + 1, 7))   # engine docIds
QUERIES = [
    ["def", "return", "value"],
    ["hash", "map", "set", "list", "dict", "array"],
    ["posting", "term", "lexicon", "query"],
    ["running", "runs", "runner"],
]


def _corpus() -> pa.Table:
    t = generate_corpus_table(N_DOCS, seed=42).drop_columns(["sha256"])
    return t.take(pc.sort_indices(
        t, sort_keys=[("repo", "ascending"), ("path", "ascending")]))


def _build(tbl: pa.Table, out: str):
    import ray.data as rd
    from mircv_ray.build import build_index
    return build_index(rd.from_arrow(tbl), out, CFG)


def _dump_sorted(idx: str, **kw) -> pa.Table:
    import ray
    from mircv_ray.query.dump import dump_postings
    t = pa.concat_tables(
        ray.get(dump_postings(idx, docno_offset=0, **kw).to_arrow_refs()))
    return t.take(pc.sort_indices(t, sort_keys=[
        ("term", "ascending"), ("doc_id", "ascending")])).combine_chunks()


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    """(full index, same index with tombstones, vacuumed dir,
    fresh build over the survivors)"""
    from mircv_ray.build import delete_docs, vacuum_index
    root = tmp_path_factory.mktemp("tomb")
    corpus = _corpus()
    _build(corpus, str(root / "full"))
    _build(corpus, str(root / "del"))
    n = delete_docs(str(root / "del"), DELETED)
    assert n == len(DELETED)
    vacuum_index(str(root / "del"), str(root / "vac"))
    # survivors: engine docId == 1 + row rank in the (repo, path)-sorted
    # corpus, so row i corresponds to docId i+1
    keep = [i for i in range(N_DOCS) if (i + 1) not in set(DELETED)]
    _build(corpus.take(pa.array(keep)), str(root / "surv"))
    return root


def _engine(path, k=10, algo="auto"):
    from mircv_ray.query import QueryEngine
    return QueryEngine(str(path),
                       QueryConfig(standard="BM25", k=k, parse=True,
                                   algo=algo))


def _expected_topk(full_engine, terms, k=10, strict=False):
    """Pre-delete ranking (k = all docs) minus deleted docs, top k."""
    res = (full_engine.score_terms_strict_and(terms) if strict
           else full_engine.score_terms(terms))
    dead = set(DELETED)
    res = [(d, s) for d, s in res if d not in dead]
    res.sort(key=lambda t: (-t[1], t[0]))
    return res[:k]


class TestQueryFiltering:
    def test_taat_path(self, idx):
        full = _engine(idx / "full", k=N_DOCS)
        deleted = _engine(idx / "del")
        for q in QUERIES:
            assert deleted.score_terms(q) == _expected_topk(full, q), q

    def test_maxscore_path(self, idx):
        # the MaxScore loop's per-doc summation ORDER depends on the
        # theta trajectory (pivot position), which necessarily differs
        # once deleted docs stop entering the heap — so scores can move
        # by 1 ulp vs the reference ranking; ids must match exactly
        full = _engine(idx / "full", k=N_DOCS, algo="maxscore")
        deleted = _engine(idx / "del", algo="maxscore")
        for q in QUERIES:
            got = deleted.score_terms(q)
            exp = _expected_topk(full, q)
            assert [d for d, _ in got] == [d for d, _ in exp], q
            for (_, gs), (_, es) in zip(got, exp):
                assert gs == pytest.approx(es, rel=1e-12), q

    def test_strict_and_path(self, idx):
        full = _engine(idx / "full", k=N_DOCS)
        deleted = _engine(idx / "del")
        for q in QUERIES:
            assert deleted.score_terms_strict_and(q) == \
                _expected_topk(full, q, strict=True), q

    def test_conjunctive_maxscore_no_dead_docs(self, idx):
        deleted = _engine(idx / "del", algo="maxscore")
        dead = set(DELETED)
        for q in QUERIES:
            for d, _ in deleted.score_terms(q, conjunctive=True):
                assert d not in dead

    def test_full_index_unaffected(self, idx):
        """The tombstone sidecar lives beside the index it was written
        to — the pristine copy still returns deleted docs."""
        full = _engine(idx / "full")
        hit_dead = any(d in set(DELETED)
                       for q in QUERIES for d, _ in full.score_terms(q))
        assert hit_dead  # sanity: the deletion set intersects the top-k


class TestDumpFiltering:
    def test_apply_tombstones(self, idx):
        dumped = _dump_sorted(str(idx / "del"), apply_tombstones=True)
        raw = _dump_sorted(str(idx / "full"))
        keep = ~np.isin(raw["doc_id"].to_numpy(), DELETED)
        assert dumped.equals(raw.filter(pa.array(keep)))

    def test_without_flag_identical_to_full(self, idx):
        assert _dump_sorted(str(idx / "del")).equals(
            _dump_sorted(str(idx / "full")))


class TestVacuum:
    def test_equals_fresh_build(self, idx):
        dv = _dump_sorted(str(idx / "vac"))
        ds = _dump_sorted(str(idx / "surv"))
        assert dv.equals(ds)
        lv = pq.read_table(str(idx / "vac" / "lexicon"))
        ls = pq.read_table(str(idx / "surv" / "lexicon"))
        assert lv.take(pc.sort_indices(lv["term"])).equals(
            ls.take(pc.sort_indices(ls["term"])))

    def test_stats_match(self, idx):
        from mircv_ray.build import load_stats
        sv = load_stats(str(idx / "vac"))
        ss = load_stats(str(idx / "surv"))
        for k in ("n_docs", "total_doc_len", "num_terms", "avg_doc_len"):
            assert sv[k] == ss[k], k

    def test_query_scores_match(self, idx):
        ev = _engine(idx / "vac")
        es = _engine(idx / "surv")
        for q in QUERIES:
            assert ev.score_terms(q) == es.score_terms(q), q

    def test_docs_renumbered_dense(self, idx):
        t = pq.read_table(str(idx / "vac" / "docs"), columns=["doc_id"])
        ids = np.sort(t["doc_id"].to_numpy())
        assert ids[0] == 1 and ids[-1] == N_DOCS - len(DELETED)
        assert len(np.unique(ids)) == len(ids)


class TestLifecycle:
    def test_out_of_range_raises(self, idx):
        from mircv_ray.build import delete_docs
        with pytest.raises(ValueError, match="outside"):
            delete_docs(str(idx / "full"), [N_DOCS + 1])
        with pytest.raises(ValueError, match="outside"):
            delete_docs(str(idx / "full"), [0])

    def test_accumulate_and_dedupe(self, ray_session, tmp_path):
        from mircv_ray.build import (clear_tombstones, delete_docs,
                                     load_tombstones)
        out = str(tmp_path / "acc")
        _build(_corpus(), out)
        assert delete_docs(out, [5, 9]) == 2
        assert delete_docs(out, [9, 11]) == 3      # 9 dedupes
        assert list(load_tombstones(out)) == [5, 9, 11]
        clear_tombstones(out)
        assert len(load_tombstones(out)) == 0

    def test_vacuum_without_tombstones_is_identity(self, idx, tmp_path):
        from mircv_ray.build import vacuum_index
        vacuum_index(str(idx / "full"), str(tmp_path / "novac"))
        assert _dump_sorted(str(tmp_path / "novac")).equals(
            _dump_sorted(str(idx / "full")))

    def test_delete_all_then_vacuum(self, ray_session, tmp_path):
        from mircv_ray.build import delete_docs, load_stats, vacuum_index
        out = str(tmp_path / "all")
        _build(_corpus(), out)
        delete_docs(out, list(range(1, N_DOCS + 1)))
        vacuum_index(out, str(tmp_path / "empty"))
        st = load_stats(str(tmp_path / "empty"))
        assert st["n_docs"] == 0 and st["num_terms"] == 0


class TestReshardIndex:
    def test_reshard_preserves_postings_and_queries(self, ray_session,
                                                    tmp_path):
        import ray.data as rd
        from mircv_ray.build import build_index, delete_docs, reshard_index
        from mircv_ray.config import IndexConfig, QueryConfig
        from mircv_ray.query.engine import IndexReader, QueryEngine
        from mircv_ray.sources import generate_corpus_table

        table = generate_corpus_table(90, seed=33).drop_columns(["sha256"])
        src = str(tmp_path / "src")
        build_index(rd.from_arrow(table), src,
                    IndexConfig(parse=True, num_shards=4, salt_buckets=2))
        delete_docs(src, [5, 17])
        out = str(tmp_path / "resharded")
        met = reshard_index(src, out, num_shards=7, salt_buckets=3,
                            codec="ef")
        assert met["num_shards"] == 7 and met["codec"] == "ef"
        # reference layout: a from-scratch vacuum at the same knobs
        from mircv_ray.build import vacuum_index
        ref = str(tmp_path / "ref")
        vacuum_index(src, ref, IndexConfig(
            parse=True, squeeze=True, codec="ef", num_shards=7,
            salt_buckets=3))
        a, b = IndexReader(out), IndexReader(ref)
        assert a._lex == b._lex
        for term in list(a._lex)[:50]:
            ia, ta = a.decoded(term)
            ib, tb = b.decoded(term)
            assert ia.tolist() == ib.tolist()
            assert ta.tolist() == tb.tolist()
        # queries are LAYOUT-invariant: the resharded (7/3/ef) index
        # returns exactly the results of a same-survivor-set index at
        # the ORIGINAL layout (4/2/vbyte) — collection stats recompute
        # over the survivors either way (vacuum semantics), only the
        # physical sharding/salting/codec changed
        orig_layout = str(tmp_path / "orig_layout")
        vacuum_index(src, orig_layout, IndexConfig(
            parse=True, squeeze=True, codec="vbyte", num_shards=4,
            salt_buckets=2))
        es = QueryEngine(orig_layout, QueryConfig(k=10))
        er = QueryEngine(out, QueryConfig(k=10))
        for q in (["def", "return"], ["hash", "map", "value"]):
            assert es.score_terms(q) == er.score_terms(q)

    def test_reshard_validation(self, ray_session, tmp_path):
        import ray.data as rd
        from mircv_ray.build import build_index, reshard_index
        from mircv_ray.config import IndexConfig
        from mircv_ray.sources import generate_corpus_table
        src = str(tmp_path / "v")
        build_index(rd.from_arrow(
            generate_corpus_table(10, seed=1).drop_columns(["sha256"])),
            src, IndexConfig(parse=True, num_shards=2, salt_buckets=1))
        with pytest.raises(ValueError):
            reshard_index(src, str(tmp_path / "x"), num_shards=-1)
        with pytest.raises(ValueError):
            reshard_index(src, str(tmp_path / "x"), codec="zstd")
