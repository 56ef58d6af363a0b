"""asof_join_backward vs a brute-force oracle."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from mircv_ray.ops import asof_join_backward


def _collect(ds, keys):
    import ray
    tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    t = pa.concat_tables(tbls).combine_chunks()
    return t.take(pc.sort_indices(
        t, sort_keys=[(k, "ascending") for k in keys]))


def _rand_tables(seed=7, n_left=4000, n_right=900, n_keys=12):
    rng = np.random.default_rng(seed)
    left = pa.table({
        "k": pa.array(rng.integers(0, n_keys, n_left), type=pa.int64()),
        "t": pa.array(rng.integers(0, 10_000, n_left), type=pa.int64()),
        "lid": pa.array(np.arange(n_left), type=pa.int64()),
    })
    right = pa.table({
        "k": pa.array(rng.integers(0, n_keys, n_right), type=pa.int64()),
        "t": pa.array(rng.integers(0, 10_000, n_right), type=pa.int64()),
        "rid": pa.array(np.arange(n_right), type=pa.int64()),
        "val": pa.array(rng.integers(0, 1000, n_right), type=pa.int64()),
    })
    return left, right


def _brute(left: pa.Table, right: pa.Table, tolerance=None):
    lp, rp = left.to_pylist(), right.to_pylist()
    out = []
    for lr in lp:
        best = None
        for rr in rp:
            if rr["k"] != lr["k"] or rr["t"] > lr["t"]:
                continue
            if tolerance is not None and lr["t"] - rr["t"] > tolerance:
                continue
            if best is None or (rr["t"], rr["rid"]) > (best["t"], best["rid"]):
                best = rr
        out.append({**lr,
                    "r_t": best["t"] if best else None,
                    "r_id": best["rid"] if best else None,
                    "r_val": best["val"] if best else None})
    out.sort(key=lambda r: r["lid"])
    return out


ATTACH = {"t": "r_t", "rid": "r_id", "val": "r_val"}


class TestAsofJoin:
    def test_matches_brute_force(self, ray_session):
        import ray.data as rd
        left, right = _rand_tables()
        got = _collect(asof_join_backward(
            rd.from_arrow(left).repartition(8),
            rd.from_arrow(right).repartition(8),
            by="k", on="t", right_order="rid", attach=ATTACH), ["lid"])
        assert got.to_pylist() == _brute(left, right)

    def test_tolerance(self, ray_session):
        import ray.data as rd
        left, right = _rand_tables(seed=13, n_left=800, n_right=300)
        got = _collect(asof_join_backward(
            rd.from_arrow(left), rd.from_arrow(right),
            by="k", on="t", right_order="rid", attach=ATTACH,
            tolerance=250), ["lid"])
        assert got.to_pylist() == _brute(left, right, tolerance=250)

    def test_key_without_rights_gets_nulls(self, ray_session):
        import ray.data as rd
        left = pa.table({"k": pa.array([1, 2], pa.int64()),
                         "t": pa.array([5, 5], pa.int64()),
                         "lid": pa.array([0, 1], pa.int64())})
        right = pa.table({"k": pa.array([1], pa.int64()),
                          "t": pa.array([3], pa.int64()),
                          "rid": pa.array([0], pa.int64()),
                          "val": pa.array([42], pa.int64())})
        got = _collect(asof_join_backward(
            rd.from_arrow(left), rd.from_arrow(right),
            by="k", on="t", right_order="rid", attach=ATTACH), ["lid"])
        assert got["r_val"].to_pylist() == [42, None]

    def test_tie_on_t_takes_highest_order(self, ray_session):
        import ray.data as rd
        left = pa.table({"k": pa.array([1], pa.int64()),
                         "t": pa.array([10], pa.int64()),
                         "lid": pa.array([0], pa.int64())})
        right = pa.table({"k": pa.array([1, 1, 1], pa.int64()),
                          "t": pa.array([10, 10, 9], pa.int64()),
                          "rid": pa.array([3, 7, 9], pa.int64()),
                          "val": pa.array([1, 2, 3], pa.int64())})
        got = _collect(asof_join_backward(
            rd.from_arrow(left), rd.from_arrow(right),
            by="k", on="t", right_order="rid", attach=ATTACH), ["lid"])
        assert got["r_id"].to_pylist() == [7]   # inclusive; max rid at t=10

    def test_partitioning_independent(self, ray_session):
        import ray.data as rd
        left, right = _rand_tables(seed=21, n_left=1000, n_right=400)
        a = _collect(asof_join_backward(
            rd.from_arrow(left).repartition(1), rd.from_arrow(right),
            by="k", on="t", right_order="rid", attach=ATTACH), ["lid"])
        b = _collect(asof_join_backward(
            rd.from_arrow(left).repartition(16),
            rd.from_arrow(right).repartition(16),
            by="k", on="t", right_order="rid", attach=ATTACH), ["lid"])
        assert a.equals(b)

    @pytest.mark.parametrize("salt_width", [100, 1000, 5000, 20_000])
    def test_salted_equals_unsalted(self, ray_session, salt_width):
        import ray.data as rd
        left, right = _rand_tables(seed=31, n_left=2000, n_right=500)
        from mircv_ray.ops import asof_join_backward_salted
        a = _collect(asof_join_backward(
            rd.from_arrow(left), rd.from_arrow(right),
            by="k", on="t", right_order="rid", attach=ATTACH), ["lid"])
        b = _collect(asof_join_backward_salted(
            rd.from_arrow(left).repartition(8),
            rd.from_arrow(right).repartition(8),
            by="k", on="t", right_order="rid", attach=ATTACH,
            salt_width=salt_width), ["lid"])
        assert a.equals(b), salt_width

    def test_salted_with_tolerance(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops import asof_join_backward_salted
        left, right = _rand_tables(seed=37, n_left=800, n_right=200)
        got = _collect(asof_join_backward_salted(
            rd.from_arrow(left), rd.from_arrow(right),
            by="k", on="t", right_order="rid", attach=ATTACH,
            salt_width=150, tolerance=400), ["lid"])
        assert got.to_pylist() == _brute(left, right, tolerance=400)

    def test_salted_key_without_rights(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops import asof_join_backward_salted
        left = pa.table({"k": pa.array([1, 2], pa.int64()),
                         "t": pa.array([500, 500], pa.int64()),
                         "lid": pa.array([0, 1], pa.int64())})
        right = pa.table({"k": pa.array([1], pa.int64()),
                          "t": pa.array([3], pa.int64()),
                          "rid": pa.array([0], pa.int64()),
                          "val": pa.array([42], pa.int64())})
        got = _collect(asof_join_backward_salted(
            rd.from_arrow(left), rd.from_arrow(right),
            by="k", on="t", right_order="rid", attach=ATTACH,
            salt_width=100), ["lid"])
        assert got["r_val"].to_pylist() == [42, None]

    def test_salted_tolerance_requires_on_attached(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops import asof_join_backward_salted
        left, right = _rand_tables(n_left=10, n_right=10)
        with pytest.raises(ValueError, match="requires attaching"):
            asof_join_backward_salted(
                rd.from_arrow(left), rd.from_arrow(right),
                by="k", on="t", right_order="rid",
                attach={"val": "r_val"}, salt_width=100,
                tolerance=10).materialize()

    def test_name_collision_raises(self, ray_session):
        import ray.data as rd
        left, right = _rand_tables(n_left=10, n_right=10)
        with pytest.raises(ValueError, match="already a left column"):
            asof_join_backward(rd.from_arrow(left), rd.from_arrow(right),
                               by="k", on="t", right_order="rid",
                               attach={"val": "lid"})
