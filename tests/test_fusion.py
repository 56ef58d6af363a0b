"""Reciprocal Rank Fusion (ops/fusion.py) + the hybrid_rrf entry."""

import numpy as np
import pyarrow as pa
import pytest

from mircv_ray.ops.fusion import rrf_fuse


def _brute_rrf(sides, k=10, k_rrf=60):
    """Dict-of-dicts reference implementation."""
    fused: dict = {}
    for rows in sides:
        byq: dict = {}
        for qid, doc, score in rows:
            byq.setdefault(qid, []).append((doc, score))
        for qid, lst in byq.items():
            lst.sort(key=lambda r: (-r[1], r[0]))
            for rank, (doc, _) in enumerate(lst[:k], start=1):
                fused.setdefault(qid, {}).setdefault(doc, 0.0)
                fused[qid][doc] += 1.0 / (k_rrf + rank)
    out = []
    for qid in sorted(fused):
        ranked = sorted(fused[qid].items(), key=lambda r: (-r[1], r[0]))
        out += [(qid, doc, v) for doc, v in ranked[:k]]
    return out


def _tbl(rows):
    return pa.table({
        "qid": pa.array([r[0] for r in rows], type=pa.int64()),
        "doc_id": pa.array([r[1] for r in rows], type=pa.int64()),
        "score": pa.array([r[2] for r in rows], type=pa.float64()),
    })


class TestRrfFuse:
    def test_matches_brute_force_random(self):
        rng = np.random.default_rng(3)
        sides_rows = []
        for _ in range(3):
            rows = []
            for qid in range(5):
                docs = rng.choice(200, size=40, replace=False)
                for d in docs:
                    rows.append((qid, int(d), float(rng.random())))
            sides_rows.append(rows)
        got = rrf_fuse([_tbl(r) for r in sides_rows], k=10)
        want = _brute_rrf(sides_rows, k=10)
        got_rows = list(zip(got["qid"].to_pylist(),
                            got["doc_id"].to_pylist(),
                            got["rrf"].to_pylist()))
        got_rows.sort()
        want_sorted = sorted(want)
        assert [(q, d) for q, d, _ in got_rows] == \
            [(q, d) for q, d, _ in want_sorted]
        np.testing.assert_allclose([v for _, _, v in got_rows],
                                   [v for _, _, v in want_sorted],
                                   rtol=0, atol=1e-12)

    def test_rank_recomputed_not_row_order(self):
        # rows arrive in ascending-score order: rank must still be by
        # score DESC
        rows = [(0, 7, 0.1), (0, 3, 0.9), (0, 5, 0.5)]
        got = rrf_fuse([_tbl(rows)], k=2)
        assert got["doc_id"].to_pylist() == [3, 5]     # top-2 by score
        np.testing.assert_allclose(got["rrf"].to_pylist(),
                                   [1 / 61, 1 / 62])

    def test_score_tie_breaks_by_id(self):
        rows = [(0, 9, 0.5), (0, 2, 0.5), (0, 4, 0.5)]
        got = rrf_fuse([_tbl(rows)], k=3)
        assert got["doc_id"].to_pylist() == [2, 4, 9]

    def test_doc_on_both_sides_sums(self):
        a = [(0, 1, 1.0), (0, 2, 0.5)]
        b = [(0, 2, 1.0), (0, 3, 0.5)]
        got = rrf_fuse([_tbl(a), _tbl(b)], k=3)
        byid = dict(zip(got["doc_id"].to_pylist(),
                        got["rrf"].to_pylist()))
        assert byid[2] == pytest.approx(1 / 62 + 1 / 61, abs=1e-15)
        assert got["doc_id"].to_pylist()[0] == 2   # fused beats singles

    def test_empty_and_single_side(self):
        empty = _tbl([])
        assert rrf_fuse([empty, empty]).num_rows == 0
        one = rrf_fuse([_tbl([(1, 5, 2.0)]), empty], k=10)
        assert one["qid"].to_pylist() == [1]
        assert one["rrf"].to_pylist() == [pytest.approx(1 / 61)]

    def test_truncates_each_side_to_k(self):
        # doc ranked 11th on a side must contribute nothing
        rows = [(0, d, 100.0 - d) for d in range(12)]
        got = rrf_fuse([_tbl(rows)], k=10)
        assert 10 not in got["doc_id"].to_pylist()
        assert 11 not in got["doc_id"].to_pylist()


class TestHybridRrfEntry:
    @pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
    def test_matches_duckdb_oracle(self, ray_session, sf_dir):
        import duckdb

        import __ray_entry__ as e
        got = e.queries()["hybrid_rrf"](sf_dir)
        con = duckdb.connect()
        for t in ("documents", "embeddings"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf_dir}/{t}.parquet')")
        want = con.execute(e.oracle_sql()["hybrid_rrf"]).arrow()
        assert got.num_rows == want.num_rows
        assert got["qid"].to_pylist() == want["qid"].to_pylist()
        assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
        np.testing.assert_allclose(got["rrf"].to_pylist(),
                                   want["rrf"].to_pylist(), atol=1e-9)
