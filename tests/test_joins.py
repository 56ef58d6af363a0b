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


class TestIntervalJoin:
    def _brute_interval(self, left, ivals):
        out = []
        for lr in left.to_pylist():
            cands = [r for r in ivals.to_pylist()
                     if r["k"] == lr["k"] and r["start"] <= lr["t"]]
            best = max(cands, key=lambda r: (r["start"], r["end"]),
                       default=None)
            hit = best if best and lr["t"] <= best["end"] else None
            out.append({**lr,
                        "iv_id": hit["iv_id"] if hit else None,
                        "iv_end": hit["end"] if hit else None})
        out.sort(key=lambda r: r["lid"])
        return out

    def test_disjoint_intervals_exact(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops import interval_join
        rng = np.random.default_rng(3)
        # disjoint intervals per key: sorted cut points
        rows = {"k": [], "start": [], "end": [], "iv_id": []}
        iv = 0
        for k in range(5):
            cuts = np.sort(rng.choice(10_000, size=12, replace=False))
            for s, e in zip(cuts[::2], cuts[1::2]):
                rows["k"].append(k)
                rows["start"].append(int(s))
                rows["end"].append(int(e))
                rows["iv_id"].append(iv)
                iv += 1
        ivals = pa.table({c: pa.array(v, type=pa.int64())
                          for c, v in rows.items()})
        left = pa.table({
            "k": pa.array(rng.integers(0, 5, 3000), type=pa.int64()),
            "t": pa.array(rng.integers(0, 10_000, 3000), type=pa.int64()),
            "lid": pa.array(np.arange(3000), type=pa.int64()),
        })
        got = _collect(interval_join(
            rd.from_arrow(left).repartition(8),
            rd.from_arrow(ivals).repartition(4),
            by="k", on="t", start_col="start", end_col="end",
            attach={"iv_id": "iv_id", "end": "iv_end"}), ["lid"])
        assert got.to_pylist() == self._brute_interval(left, ivals)

    def test_sessions_containment(self, ray_session):
        """Events interval-joined onto their OWN sessionize output must
        land in exactly the session that produced them."""
        import ray.data as rd
        from mircv_ray.ops import interval_join, sessionize
        rng = np.random.default_rng(11)
        n = 4000
        ts = np.sort(rng.integers(0, 10**10, n))
        ev = pa.table({
            "user_id": pa.array(rng.integers(0, 20, n), type=pa.int64()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "event_id": pa.array(np.arange(n), type=pa.int64()),
            "value": pa.array(rng.uniform(0, 10, n)),
        })
        sess = sessionize(rd.from_arrow(ev))
        joined = _collect(interval_join(
            rd.from_arrow(pa.table({
                "user_id": ev["user_id"],
                "t": ev["ts"].cast(pa.int64()),
                "event_id": ev["event_id"]})),
            sess, by="user_id", on="t",
            start_col="start_us", end_col="end_us",
            attach={"session_id": "session_id"}), ["event_id"])
        # every event matches some session, and session ids per user are
        # non-decreasing in time (gap sessions are time-ordered)
        assert joined["session_id"].null_count == 0
        df = joined.to_pandas().sort_values(["user_id", "t"])
        for _, g in df.groupby("user_id"):
            sid = g.session_id.to_numpy()
            assert (np.diff(sid) >= 0).all()


class TestAsofRightOrderEqualsOn:
    # round-5 review: right_order == on (no separate tiebreak column)
    # must not duplicate the __r_<on> union field and crash
    @pytest.mark.parametrize("salted", [False, True])
    def test_right_order_is_on(self, ray_session, salted):
        import ray.data as rd
        left, right = _rand_tables(seed=5, n_left=300, n_right=120)
        kw = dict(by="k", on="t", right_order="t",
                  attach={"t": "r_t", "val": "r_val"})
        if salted:
            from mircv_ray.ops import asof_join_backward_salted
            fn, kw2 = asof_join_backward_salted, dict(kw, salt_width=500)
        else:
            fn, kw2 = asof_join_backward, kw
        got = _collect(fn(
            rd.from_arrow(left).repartition(4),
            rd.from_arrow(right).repartition(3), **kw2), ["lid"])
        # brute force with (t, t) tie order == (t) order, last wins
        import collections
        rights = collections.defaultdict(list)
        for r in right.to_pylist():
            rights[r["k"]].append(r)
        exp = []
        for l in sorted(left.to_pylist(), key=lambda r: r["lid"]):
            best = None
            for r in rights.get(l["k"], []):
                if r["t"] <= l["t"] and (
                        best is None or (r["t"], r["t"]) >=
                        (best["t"], best["t"])):
                    best = r
            exp.append((l["lid"], None if best is None else best["t"],
                        None if best is None else best["val"]))
        assert [(r["lid"], r["r_t"], r["r_val"])
                for r in got.to_pylist()] == exp
