"""Substring-level dedup (shared n-gram pairs, exact + winnowing)."""

import numpy as np
import pyarrow as pa
import pytest

from mircv_ray.ops.substring import (_window_hashes, _winnow_select,
                                     ngram_window_rows, shared_ngram_pairs)

B = 1099511628211
M = 1 << 64


def _brute_pairs(texts: dict[int, str], n: int) -> set[tuple[int, int]]:
    grams = {d: {t[i:i + n] for i in range(max(len(t) - n + 1, 0))}
             for d, t in texts.items()}
    ids = sorted(texts)
    return {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
            if grams[a] & grams[b]}


def _texts_table(texts: dict[int, str]) -> pa.Table:
    ids = sorted(texts)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array([texts[i] for i in ids])})


class TestKernels:
    def test_rolling_hash_matches_direct(self):
        rng = np.random.default_rng(7)
        data = rng.integers(32, 127, 400).astype(np.uint8)
        n = 9
        starts = np.arange(0, len(data) - n + 1, dtype=np.int64)
        h = _window_hashes(data, starts, n)
        for s in range(0, len(starts), 17):
            direct = sum(int(data[s + j]) * pow(B, j, M)
                         for j in range(n)) % M
            assert int(h[s]) == direct

    def test_rolling_hash_position_independent(self):
        data = np.frombuffer(b"xyzABCDEFuvwABCDEF", dtype=np.uint8).copy()
        h = _window_hashes(data, np.array([3, 12], dtype=np.int64), 6)
        assert h[0] == h[1]

    def test_winnow_guarantee_every_w_run_selected(self):
        rng = np.random.default_rng(3)
        wins = np.array([64, 1, 0, 23], dtype=np.int64)
        h = rng.integers(0, 2 ** 63, int(wins.sum()), dtype=np.uint64)
        w = 6
        sel = set(_winnow_select(h, wins, w).tolist())
        off = 0
        for width in wins:
            for st in range(int(width) - w + 1):
                assert any(off + st + j in sel for j in range(w))
            off += int(width)

    def test_winnow_w1_selects_all(self):
        wins = np.array([5], dtype=np.int64)
        h = np.arange(5, dtype=np.uint64)
        assert _winnow_select(h, wins, 1).tolist() == [0, 1, 2, 3, 4]

    def test_window_rows_short_doc_and_empty(self):
        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": ["tiny", ""]})
        assert ngram_window_rows(t, n=10).num_rows == 0
        empty = t.slice(0, 0)
        assert ngram_window_rows(empty, n=10).num_rows == 0

    def test_window_rows_grams_are_real_substrings(self):
        t = _texts_table({1: "hello world, hello there"})
        rows = ngram_window_rows(t, n=5)
        text = "hello world, hello there"
        expect = [text[i:i + 5].encode() for i in range(len(text) - 4)]
        assert rows["gram"].to_pylist() == expect


class TestSharedNgramPairs:
    def test_exact_matches_brute_force(self, ray_session):
        import ray.data as rd
        rng = np.random.default_rng(11)
        base = ("the quick brown fox jumps over the lazy dog while "
                "writing distributed data pipelines for fun and profit")
        texts = {}
        for d in range(40):
            chars = rng.integers(97, 123, 120).astype(np.uint8)
            texts[d] = bytes(chars).decode()
        # plant shared runs of assorted lengths
        texts[3] = texts[3][:20] + base[:35] + texts[3][55:]
        texts[17] = base[:35] + texts[17][35:]
        texts[21] = texts[21][:50] + base[40:80]
        texts[33] = base[40:80] + texts[33][40:]
        n = 25
        want = _brute_pairs(texts, n)
        assert want  # planted dups must register
        out = shared_ngram_pairs(rd.from_arrow(_texts_table(texts)), n=n)
        got = {(r["a"], r["b"]) for r in out.take_all()}
        assert got == want

    def test_exact_no_self_pairs_on_repetitive_doc(self, ray_session):
        import ray.data as rd
        texts = {1: "abcabcabcabcabcabcabcabc", 2: "zzzzzzzzzzzzzzzzz"}
        out = shared_ngram_pairs(rd.from_arrow(_texts_table(texts)), n=6)
        assert out.take_all() == []

    @pytest.mark.parametrize("w", [4, 10])
    def test_winnow_recall_guarantee(self, ray_session, w):
        import ray.data as rd
        rng = np.random.default_rng(5)
        n = 12
        texts = {}
        for d in range(30):
            texts[d] = bytes(rng.integers(97, 123, 90).astype(np.uint8)) \
                .decode()
        shared = bytes(rng.integers(97, 123, n + w - 1).astype(np.uint8)) \
            .decode()
        texts[2] = shared + texts[2][len(shared):]
        texts[9] = texts[9][:30] + shared + texts[9][30 + len(shared):]
        tbl = _texts_table(texts)
        exact = shared_ngram_pairs(rd.from_arrow(tbl), n=n + w - 1)
        want = {(r["a"], r["b"]) for r in exact.take_all()}
        assert (2, 9) in want
        winnowed = shared_ngram_pairs(rd.from_arrow(tbl), n=n, winnow_w=w)
        got = {(r["a"], r["b"]) for r in winnowed.take_all()}
        # guarantee: every pair sharing a run >= n+w-1 is found
        assert want <= got

    def test_winnow_driver_entry_self_validates(self, ray_session):
        # the rows-only driver entry's in-entry recall assert must hold
        # on the real test corpus (it hard-fails the entry otherwise)
        import __ray_entry__ as e
        out = e.queries()["substring_dup_winnow"]("/root/testdata/sf0.001")
        assert out.num_rows > 0
        assert sorted(out.schema.names) == ["a", "b"]

    def test_exact_matches_duckdb_oracle(self, ray_session, tmp_path):
        import duckdb
        import pyarrow.parquet as pq
        import ray.data as rd
        rng = np.random.default_rng(23)
        texts = {}
        for d in range(60):
            texts[d] = bytes(rng.integers(97, 123, 150).astype(np.uint8)) \
                .decode()
        boiler = bytes(rng.integers(97, 123, 45).astype(np.uint8)).decode()
        for d in (5, 12, 40):  # a 3-doc duplicate cluster
            texts[d] = texts[d][:40] + boiler + texts[d][85:]
        tbl = _texts_table(texts)
        p = tmp_path / "docs.parquet"
        pq.write_table(tbl, p)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS "
                    f"SELECT * FROM read_parquet('{p}')")
        oracle = con.execute("""
            WITH grams AS (
              SELECT doc_id, substr(text, CAST(i AS INT), 30) AS g
              FROM documents, LATERAL (SELECT unnest(generate_series(
                   1, greatest(length(text) - 29, 0))) AS i) t)
            SELECT g1.doc_id AS a, g2.doc_id AS b
            FROM grams g1 JOIN grams g2
              ON g1.g = g2.g AND g1.doc_id < g2.doc_id
            GROUP BY 1, 2 ORDER BY 1, 2
        """).fetch_arrow_table()
        out = shared_ngram_pairs(rd.from_arrow(tbl), n=30)
        got = sorted((r["a"], r["b"]) for r in out.take_all())
        want = sorted(zip(oracle["a"].to_pylist(), oracle["b"].to_pylist()))
        assert got == want
        assert {(5, 12), (5, 40), (12, 40)} <= set(want)


def test_sliding_argmin_equivalence_ties():
    # round-5 review: the O(total) block-decomposition sliding argmin
    # must equal sliding_window_view(...).argmin (leftmost tie) exactly,
    # including tie-heavy and sentinel-laden inputs
    from mircv_ray.ops.substring import _SENTINEL, _sliding_argmin
    rng = np.random.default_rng(3)
    for _ in range(60):
        n = int(rng.integers(2, 300))
        w = int(rng.integers(2, max(min(n, 40), 3)))
        padded = rng.integers(0, 5, n).astype(np.uint64)
        padded[rng.integers(0, n, n // 4)] = _SENTINEL
        sw = np.lib.stride_tricks.sliding_window_view(padded, w)
        exp = sw.argmin(axis=1) + np.arange(len(sw), dtype=np.int64)
        got = _sliding_argmin(padded, w)
        assert (got == exp).all()
