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


# ------------------------------- CombSUM / CombMNZ (Fox & Shaw TREC-2)

def _brute_comb(sides, k=10, method="sum", weights=None):
    per_doc: dict = {}
    for si, rows in enumerate(sides):
        byq: dict = {}
        for qid, doc, score in rows:
            byq.setdefault(qid, []).append((doc, score))
        for qid, lst in byq.items():
            lst.sort(key=lambda r: (-r[1], r[0]))
            lst = lst[:k]
            scores = [s for _, s in lst]
            mx, mn = max(scores), min(scores)
            for doc, s in lst:
                norm = (s - mn) / (mx - mn) if mx > mn else 1.0
                if weights is not None:
                    norm = weights[si] * norm
                agg = per_doc.setdefault(qid, {}).setdefault(doc, [0.0, 0])
                agg[0] += norm
                agg[1] += 1
    out = []
    for qid in sorted(per_doc):
        items = [(doc, (s * c if method == "mnz" else s))
                 for doc, (s, c) in per_doc[qid].items()]
        items.sort(key=lambda r: (-r[1], r[0]))
        out += [(qid, doc, v) for doc, v in items[:k]]
    return out


class TestCombFuse:
    def _assert_matches(self, sides_rows, k=10, method="sum", weights=None):
        from mircv_ray.ops.fusion import comb_fuse
        got = comb_fuse([_tbl(r) for r in sides_rows], k=k, method=method,
                        weights=weights)
        want = _brute_comb(sides_rows, k=k, method=method, weights=weights)
        got_rows = sorted(zip(got["qid"].to_pylist(),
                              got["doc_id"].to_pylist(),
                              got["fused"].to_pylist()))
        want = sorted(want)
        assert [(q, d) for q, d, _ in got_rows] == \
            [(q, d) for q, d, _ in want]
        np.testing.assert_allclose([v for _, _, v in got_rows],
                                   [v for _, _, v in want],
                                   rtol=0, atol=1e-12)

    @pytest.mark.parametrize("method", ["sum", "mnz"])
    def test_matches_brute_force_random(self, method):
        rng = np.random.default_rng(11)
        sides_rows = []
        for _ in range(3):
            rows = []
            for qid in range(5):
                docs = rng.choice(150, size=30, replace=False)
                rows += [(qid, int(d), float(rng.random())) for d in docs]
            sides_rows.append(rows)
        self._assert_matches(sides_rows, k=10, method=method)

    def test_weighted_interpolation(self):
        rng = np.random.default_rng(12)
        sides_rows = []
        for _ in range(2):
            rows = [(0, int(d), float(rng.random()))
                    for d in rng.choice(60, size=20, replace=False)]
            sides_rows.append(rows)
        self._assert_matches(sides_rows, k=5, method="sum",
                             weights=[0.7, 0.3])

    def test_uniform_score_list_norm_is_one(self):
        from mircv_ray.ops.fusion import comb_fuse
        rows = [(0, 1, 0.5), (0, 2, 0.5), (0, 3, 0.5)]
        got = comb_fuse([_tbl(rows)], k=3)
        assert got["fused"].to_pylist() == [1.0, 1.0, 1.0]
        assert got["doc_id"].to_pylist() == [1, 2, 3]  # ties by id

    def test_mnz_rewards_agreement(self):
        from mircv_ray.ops.fusion import comb_fuse
        # doc 1 on both sides (mid scores), docs 2/3 each on one side
        # (top scores): MNZ must rank the agreed doc first
        s1 = [(0, 1, 0.5), (0, 2, 0.9), (0, 9, 0.1)]
        s2 = [(0, 1, 0.5), (0, 3, 0.9), (0, 8, 0.1)]
        got = comb_fuse([_tbl(s1), _tbl(s2)], k=3, method="mnz")
        assert got["doc_id"].to_pylist()[0] == 1

    def test_validation(self):
        from mircv_ray.ops.fusion import comb_fuse
        with pytest.raises(ValueError, match="method"):
            comb_fuse([_tbl([(0, 1, 1.0)])], method="max")
        with pytest.raises(ValueError, match="weights"):
            comb_fuse([_tbl([(0, 1, 1.0)])], weights=[0.5, 0.5])
