"""Distinct-count operators: exact per-group COUNT(DISTINCT) vs pandas,
HyperLogLog accuracy bounds + partitioning-independence."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from mircv_ray.ops import exact_distinct_per_group, hll_distinct_per_group
from mircv_ray.ops.sketches import _clz64, _estimate, _splitmix64


def _collect(ds, keys):
    import pyarrow.compute as pc
    import ray
    tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    t = pa.concat_tables(tbls).combine_chunks()
    return t.take(pc.sort_indices(
        t, sort_keys=[(k, "ascending") for k in keys]))


def _events_table(n=40_000, n_groups=6, n_users=3_000, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table({
        "g": pa.array(rng.integers(0, n_groups, n), type=pa.int64()),
        "u": pa.array(rng.integers(0, n_users, n), type=pa.int64()),
    })


class TestExactDistinct:
    def test_matches_pandas(self, ray_session):
        import ray.data as rd
        t = _events_table()
        got = _collect(exact_distinct_per_group(
            rd.from_arrow(t).repartition(16), "g", "u"), ["g"])
        exp = (t.to_pandas().groupby("g")["u"].nunique()
               .sort_index())
        assert got["g"].to_pylist() == list(exp.index)
        assert got["n_distinct"].to_pylist() == list(exp.values)

    def test_string_values(self, ray_session):
        import ray.data as rd
        t = pa.table({"g": pa.array(["a", "a", "b", "b", "b"]),
                      "u": pa.array(["x", "x", "x", "y", "z"])})
        got = _collect(exact_distinct_per_group(rd.from_arrow(t), "g", "u"),
                       ["g"])
        assert got["n_distinct"].to_pylist() == [1, 3]


class TestHLLKernels:
    def test_clz64_exact(self):
        vals = np.array([0, 1, 2, 3, 2**31, 2**52, 2**53 - 1, 2**53,
                         2**53 + 1, 2**63, 2**64 - 1], dtype=np.uint64)
        exp = [64 if v == 0 else 64 - int(v).bit_length() for v in vals]
        assert list(_clz64(vals)) == exp

    def test_splitmix_is_dispersive(self):
        h = _splitmix64(np.arange(100_000, dtype=np.uint64))
        assert len(np.unique(h)) == 100_000
        # top bits roughly uniform
        top = (h >> np.uint64(56)).astype(np.int64)
        counts = np.bincount(top, minlength=256)
        assert counts.min() > 200 and counts.max() < 600

    def test_estimate_small_range_linear_counting(self):
        # plant k distinct values directly through the register math
        m = 1 << 12
        h = _splitmix64(np.arange(300, dtype=np.uint64))
        idx = (h >> np.uint64(52)).astype(np.int64)
        w = (h << np.uint64(12)).astype(np.uint64)
        rho = (_clz64(w) + 1).clip(max=53).astype(np.uint8)
        regs = np.zeros(m, dtype=np.uint8)
        np.maximum.at(regs, idx, rho)
        assert abs(_estimate(regs) - 300) <= 6     # LC is ~exact here


class TestHLLOperator:
    @pytest.mark.parametrize("n_users,tol", [(500, 0.03), (20_000, 0.05)])
    def test_accuracy(self, ray_session, n_users, tol):
        import ray.data as rd
        t = _events_table(n=60_000, n_groups=4, n_users=n_users, seed=9)
        got = _collect(hll_distinct_per_group(
            rd.from_arrow(t).repartition(16), "g", "u"), ["g"])
        exp = t.to_pandas().groupby("g")["u"].nunique().sort_index()
        for est, true in zip(got["n_distinct_hll"].to_pylist(), exp.values):
            assert abs(est - true) <= tol * true, (est, true)

    def test_partitioning_independent(self, ray_session):
        import ray.data as rd
        t = _events_table(seed=5)
        a = _collect(hll_distinct_per_group(
            rd.from_arrow(t).repartition(1), "g", "u"), ["g"])
        b = _collect(hll_distinct_per_group(
            rd.from_arrow(t).repartition(32), "g", "u"), ["g"])
        assert a.equals(b)   # register max is order-independent

    def test_string_values(self, ray_session):
        import ray.data as rd
        rng = np.random.default_rng(11)
        users = [f"user_{i:06d}" for i in rng.integers(0, 2_000, 30_000)]
        t = pa.table({"g": pa.array(["x"] * 30_000), "u": pa.array(users)})
        got = _collect(hll_distinct_per_group(rd.from_arrow(t), "g", "u"),
                       ["g"])
        true = len(set(users))
        est = got["n_distinct_hll"][0].as_py()
        assert abs(est - true) <= 0.05 * true

    def test_bad_precision_raises(self, ray_session):
        import ray.data as rd
        with pytest.raises(ValueError, match="outside"):
            hll_distinct_per_group(rd.from_arrow(_events_table(n=10)),
                                   "g", "u", p=3)
