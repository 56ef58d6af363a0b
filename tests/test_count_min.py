"""Count-Min sketch: never under-counts, error bound, merge invariance."""
import math

import numpy as np
import pyarrow as pa


def _zipf_keys(n, n_keys, seed):
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, size=n).clip(max=n_keys)
    return [f"k{r}" for r in ranks]


def test_cm_never_undercounts_and_bound(ray_session):
    import ray.data as rd
    from mircv_ray.ops import cm_build, cm_query

    keys = _zipf_keys(20000, 500, seed=3)
    true = {}
    for k in keys:
        true[k] = true.get(k, 0) + 1
    ds = rd.from_arrow(pa.table({"k": keys})).repartition(7)

    width, depth = 256, 4          # deliberately small: forces collisions
    m = cm_build(ds, "k", width=width, depth=depth)
    assert m.shape == (depth, width)
    assert m.sum() == depth * len(keys)          # every row counts all items

    uniq = sorted(true)
    est = cm_query(m, pa.array(uniq))
    tv = np.array([true[k] for k in uniq])
    assert (est >= tv).all()                     # CM never under-counts
    # Markov bound e*N/width holds per query with prob 1-e^-depth;
    # assert with 2x slack across all 500 queries
    bound = math.e * len(keys) / width
    frac_over = float(np.mean(est - tv > 2 * bound))
    assert frac_over <= 0.05, f"{frac_over:.3f} of queries exceed 2x bound"


def test_cm_exact_when_wide_and_partition_invariant(ray_session):
    import ray.data as rd
    from mircv_ray.ops import cm_build, cm_query

    keys = _zipf_keys(5000, 40, seed=9)
    true = {}
    for k in keys:
        true[k] = true.get(k, 0) + 1
    t = pa.table({"k": keys})

    mats = [cm_build(rd.from_arrow(t).repartition(p), "k",
                     width=1 << 14, depth=4) for p in (1, 3, 16)]
    # cell sums are associative: the matrix is partition-independent
    assert (mats[0] == mats[1]).all() and (mats[1] == mats[2]).all()
    est = cm_query(mats[0], pa.array(sorted(true)))
    tv = np.array([true[k] for k in sorted(true)])
    # 40 keys into 16384 columns: no collisions -> exact
    assert (est == tv).all()


def test_cm_empty_and_unknown_keys(ray_session):
    import ray.data as rd
    from mircv_ray.ops import cm_build, cm_query

    m = cm_build(rd.from_arrow(pa.table({"k": ["a", "a", "b"]})), "k",
                 width=64, depth=3)
    assert cm_query(m, pa.array([], type=pa.string())).tolist() == []
    est = cm_query(m, pa.array(["a", "b", "never-seen"]))
    assert est[0] >= 2 and est[1] >= 1
    assert est[2] <= 3  # unknown key can only collide into existing mass
