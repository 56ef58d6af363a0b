"""global_ntile: exact SQL ntile semantics over a distributed sort."""

import numpy as np
import pyarrow as pa
import pytest


def _sql_ntile(n_rows: int, n_tiles: int) -> np.ndarray:
    base, rem = divmod(n_rows, n_tiles)
    out = []
    for t in range(1, n_tiles + 1):
        out.extend([t] * (base + (1 if t <= rem else 0)))
    return np.array(out, dtype=np.int64)


class TestGlobalNtile:
    @pytest.mark.parametrize("n,tiles", [(1000, 10), (97, 10), (5, 10),
                                         (64, 7)])
    def test_matches_sql_semantics(self, ray_session, n, tiles):
        import ray.data as rd
        from mircv_ray.ops import global_ntile
        rng = np.random.default_rng(5)
        vals = rng.permutation(n).astype(np.float64)
        tbl = pa.table({"doc_id": pa.array(np.arange(n), type=pa.int64()),
                        "score": pa.array(vals)})
        out = (global_ntile(rd.from_arrow(tbl).repartition(4),
                            ["score", "doc_id"], tiles, out_col="tile")
               .to_pandas().sort_values("score").reset_index(drop=True))
        np.testing.assert_array_equal(out.tile, _sql_ntile(n, tiles))
        # duckdb cross-check
        import duckdb
        want = duckdb.sql(
            "SELECT doc_id, ntile(%d) OVER (ORDER BY score, doc_id) AS t "
            "FROM tbl ORDER BY score" % tiles).df()
        got = out.sort_values("score")
        np.testing.assert_array_equal(got.tile.to_numpy(),
                                      want.t.to_numpy())

    def test_ties_break_by_id(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops import global_ntile
        tbl = pa.table({"doc_id": pa.array([3, 1, 2, 0], type=pa.int64()),
                        "score": pa.array([1.0, 1.0, 1.0, 1.0])})
        out = (global_ntile(rd.from_arrow(tbl), ["score", "doc_id"], 2)
               .to_pandas().sort_values("doc_id"))
        assert list(out.tile) == [1, 1, 2, 2]

    def test_validation(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops import global_ntile
        tbl = pa.table({"doc_id": pa.array([1], type=pa.int64())})
        with pytest.raises(ValueError):
            global_ntile(rd.from_arrow(tbl), ["doc_id"], 0)


class TestGlobalRank:
    """global_rank: rank / percent_rank / cume_dist over a total order
    (ops/quantiles.py: global_rank) vs DuckDB."""

    @pytest.mark.parametrize("parts", [1, 7])
    def test_matches_duckdb(self, ray_session, parts):
        import duckdb
        import ray.data as rd
        from mircv_ray.ops import global_rank
        rng = np.random.default_rng(8)
        tbl = pa.table({
            "doc_id": pa.array(np.arange(900), type=pa.int64()),
            "score": pa.array(np.round(rng.normal(0, 1, 900), 3)),
        })
        out = (global_rank(rd.from_arrow(tbl).repartition(parts),
                           ["score", "doc_id"])
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        exp = duckdb.sql("""
            SELECT doc_id,
                   rank() OVER w AS rank,
                   round(percent_rank() OVER w, 6) AS percent_rank,
                   round(cume_dist() OVER w, 6) AS cume_dist
            FROM tbl WINDOW w AS (ORDER BY score, doc_id)
            ORDER BY doc_id""").fetchdf()
        assert list(out["rank"]) == list(exp["rank"])
        np.testing.assert_allclose(out.percent_rank, exp.percent_rank,
                                   atol=1.1e-6)
        np.testing.assert_allclose(out.cume_dist, exp.cume_dist,
                                   atol=1.1e-6)

    def test_single_row(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops import global_rank
        tbl = pa.table({"doc_id": pa.array([5], type=pa.int64()),
                        "score": pa.array([1.0])})
        out = global_rank(rd.from_arrow(tbl),
                          ["score", "doc_id"]).to_pandas()
        assert list(out["rank"]) == [1]
        assert list(out.percent_rank) == [0.0]
        assert list(out.cume_dist) == [1.0]


class TestWinsorize:
    """winsorize: clip at exact global quantiles
    (ops/quantiles.py: winsorize) vs numpy/duckdb."""

    @pytest.mark.parametrize("parts", [1, 7])
    def test_matches_numpy(self, ray_session, parts):
        import ray.data as rd
        from mircv_ray.ops import winsorize
        rng = np.random.default_rng(21)
        vals = np.round(rng.normal(50, 30, 2000), 3)
        tbl = pa.table({"event_id": pa.array(np.arange(2000),
                                             type=pa.int64()),
                        "value": pa.array(vals)})
        out = (winsorize(rd.from_arrow(tbl).repartition(parts),
                         "value", 0.05, 0.95)
               .to_pandas().sort_values("event_id")
               .reset_index(drop=True))
        qlo, qhi = np.quantile(vals, [0.05, 0.95], method="linear")
        exp = np.clip(vals, qlo, qhi)
        exp = np.trunc(exp * 1e4 + np.copysign(0.5, exp)) / 1e4
        np.testing.assert_array_equal(out.value_w.to_numpy(), exp)
        # originals untouched, clip boundaries hit
        np.testing.assert_array_equal(out.value.to_numpy(), vals)
        assert (out.value_w.min() >= round(qlo, 4) - 1e-9)
        assert (out.value_w.max() <= round(qhi, 4) + 1e-9)

    def test_nulls_pass_through_and_validation(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops import winsorize
        tbl = pa.table({"event_id": pa.array([0, 1, 2], type=pa.int64()),
                        "value": pa.array([1.0, None, 100.0])})
        out = (winsorize(rd.from_arrow(tbl), "value", 0.0, 1.0)
               .to_pandas().sort_values("event_id"))
        assert out.value_w.isna().tolist() == [False, True, False]
        import pytest as _pt
        with _pt.raises(ValueError):
            winsorize(rd.from_arrow(tbl), "value", 0.9, 0.1)
        empty = pa.table({"event_id": pa.array([0], type=pa.int64()),
                          "value": pa.array([None], type=pa.float64())})
        with _pt.raises(ValueError):
            winsorize(rd.from_arrow(empty), "value")


class TestZscoreNormalize:
    """zscore_normalize: per-group z-score + min-max scaling
    (ops/quantiles.py: zscore_normalize) vs pandas."""

    @pytest.mark.parametrize("parts", [1, 7])
    def test_matches_pandas(self, ray_session, parts):
        import ray.data as rd
        from mircv_ray.ops import zscore_normalize
        rng = np.random.default_rng(33)
        n = 3000
        tbl = pa.table({
            "event_id": pa.array(np.arange(n), type=pa.int64()),
            "event_type": pa.array(rng.choice(["a", "b", "c"],
                                              n).tolist()),
            "value": pa.array(np.round(rng.normal(40, 25, n), 3)),
        })
        out = (zscore_normalize(rd.from_arrow(tbl).repartition(parts),
                                "event_type", "value")
               .to_pandas().sort_values("event_id")
               .reset_index(drop=True))
        df = tbl.to_pandas()
        g = df.groupby("event_type").value
        mean = g.transform("mean")
        std = g.transform(lambda s: s.std(ddof=0))
        z = ((df.value - mean) / std).to_numpy()
        mn = g.transform("min")
        mx = g.transform("max")
        mm = ((df.value - mn) / (mx - mn)).to_numpy()
        r4 = lambda a: np.trunc(a * 1e4 + np.copysign(0.5, a)) / 1e4
        np.testing.assert_allclose(out.zscore, r4(z), atol=1.1e-4)
        np.testing.assert_allclose(out.minmax, r4(mm), atol=1.1e-4)
        assert (out.minmax >= 0).all() and (out.minmax <= 1).all()

    def test_degenerate_and_nulls(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops import zscore_normalize
        tbl = pa.table({
            "event_id": pa.array([0, 1, 2], type=pa.int64()),
            "event_type": pa.array(["x", "x", "y"]),
            "value": pa.array([7.0, None, 3.0]),
        })
        out = (zscore_normalize(rd.from_arrow(tbl), "event_type",
                                "value")
               .to_pandas().sort_values("event_id"))
        # group x has ONE non-null value -> zero variance -> 0; group y
        # single value -> 0; null passes through
        assert list(out.zscore.fillna(-9)) == [0.0, -9.0, 0.0]
        assert list(out.minmax.fillna(-9)) == [0.0, -9.0, 0.0]
