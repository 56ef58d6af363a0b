"""Misra-Gries per-group heavy hitters: PODS'12 bounds vs exact counts."""
import collections

import numpy as np
import pyarrow as pa
import pytest

from mircv_ray.ops.sketches import _mg_prune, mg_heavy_hitters


def _ds(rows, nparts):
    import ray.data as rd
    g, it = zip(*rows) if rows else ((), ())
    t = pa.table({"grp": pa.array(list(g), type=pa.string()),
                  "item": pa.array(list(it), type=pa.int64())})
    return rd.from_arrow(t).repartition(nparts)


def _check_bounds(rows, out, k):
    """est <= true <= est + err, and every item with true > err present."""
    exact = collections.Counter(rows)
    totals = collections.Counter(g for g, _ in rows)
    got = {(r.grp, r.item): (r.est_count, r.err_bound, r.n_group)
           for r in out.itertuples()}
    for (g, it), (est, err, n) in got.items():
        true = exact[(g, it)]
        assert n == totals[g], (g, n, totals[g])
        assert est <= true <= est + err, (g, it, est, true, err)
    per_group_err = {}
    for (g, _), (_, err, _) in got.items():
        per_group_err[g] = err
    for (g, it), true in exact.items():
        # groups absent from the output entirely: err = n_group // (k+1)
        err = per_group_err.get(g, totals[g] // (k + 1))
        if true > err:
            assert (g, it) in got, (g, it, true, err)


@pytest.mark.parametrize("nparts", [1, 3, 16])
def test_mg_bounds_random(ray_session, nparts):
    rng = np.random.default_rng(11)
    rows = []
    for g, (n_items, n_rows) in {"a": (40, 2000), "b": (5, 50),
                                 "c": (300, 300)}.items():
        # zipf-ish skew so there ARE heavy hitters
        items = (rng.zipf(1.5, size=n_rows) % n_items).astype(int)
        rows += [(g, int(i)) for i in items]
    k = 8
    out = mg_heavy_hitters(_ds(rows, nparts), "grp", "item",
                           k=k).to_pandas()
    assert (out.groupby("grp").size() <= k).all()
    _check_bounds(rows, out, k)


def test_mg_small_group_is_exact(ray_session):
    # fewer distinct items than k -> nothing pruned, counts exact
    rows = [("g", 1)] * 5 + [("g", 2)] * 3 + [("g", 3)]
    out = mg_heavy_hitters(_ds(rows, 2), "grp", "item", k=8).to_pandas()
    got = dict(zip(out.item, out.est_count))
    assert got == {1: 5, 2: 3, 3: 1}
    assert (out.err_bound == 0).all()
    assert (out.n_group == 9).all()


def test_mg_prune_kernel():
    t = pa.table({"g": ["x"] * 5 + ["y"] * 2,
                  "i": [1, 2, 3, 4, 5, 1, 2],
                  "c": [10, 7, 4, 2, 1, 3, 3]})
    out = _mg_prune(t, "g", "i", "c", 2)
    # x: third largest = 4 subtracted -> (1,6), (2,3); y: <=2 items kept
    got = {(r["g"], r["i"]): r["c"] for r in out.to_pylist()}
    assert got == {("x", 1): 6, ("x", 2): 3, ("y", 1): 3, ("y", 2): 3}


def test_mg_capacity_tie_drop():
    # k+1 items with equal counts -> all residuals 0 -> empty summary
    t = pa.table({"g": ["x"] * 3, "i": [1, 2, 3], "c": [4, 4, 4]})
    assert _mg_prune(t, "g", "i", "c", 2).num_rows == 0
