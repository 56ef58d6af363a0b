"""StreamingTumblingWindow: event-time watermarks vs the batch answer."""

import numpy as np
import pyarrow as pa
import pytest

from mircv_ray.ops import StreamingTumblingWindow

WIDTH = 1000


def _events(n=5000, seed=3, n_types=3, horizon=50_000):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, horizon, n))
    return pa.table({
        "ts": pa.array(ts, type=pa.int64()),
        "event_type": pa.array([f"t{int(i)}" for i in
                                rng.integers(0, n_types, n)]),
        "value": pa.array(np.round(rng.uniform(0, 10, n), 2)),
    })


def _batch_answer(tbl: pa.Table) -> dict:
    df = tbl.to_pandas()
    df["w"] = (df.ts // WIDTH) * WIDTH
    # leaf-cents: each event rounds to int cents, sums are exact ints
    df["c"] = np.trunc(df.value * 100 + np.copysign(0.5, df.value))         .astype(np.int64)
    g = df.groupby(["w", "event_type"]).agg(
        n=("c", "size"), s=("c", "sum")).reset_index()
    return {(int(r.w), r.event_type): (int(r.n), int(r.s))
            for r in g.itertuples()}


def _drive(tbl: pa.Table, lateness: int, batch_size: int = 257) -> tuple:
    agg = StreamingTumblingWindow(WIDTH, allowed_lateness_us=lateness)
    parts = []
    for i in range(0, tbl.num_rows, batch_size):
        parts.append(agg.ingest(tbl.slice(i, batch_size)))
    parts.append(agg.flush())
    out = pa.concat_tables([p for p in parts if p.num_rows])
    got = {(r["window_start_us"], r["event_type"]):
           (r["n_events"], r["sum_value_cents"])
           for r in out.to_pylist()}
    assert len(got) == sum(p.num_rows for p in parts)   # emitted ONCE
    return got, agg


class TestStreamingWindow:
    def test_ordered_stream_equals_batch(self, ray_session):
        tbl = _events()
        got, agg = _drive(tbl, lateness=0)
        assert got == _batch_answer(tbl)
        assert agg.late_rows == 0

    def test_disordered_within_lateness_equals_batch(self, ray_session):
        """Shuffle each 2000-us region locally (disorder < lateness):
        the watermark holds windows open long enough for every row."""
        tbl = _events(seed=9)
        ts = tbl["ts"].to_numpy()
        rng = np.random.default_rng(1)
        jitter = np.argsort(ts + rng.integers(0, 2000, len(ts)))
        shuffled = tbl.take(pa.array(jitter))
        got, agg = _drive(shuffled, lateness=2000)
        assert got == _batch_answer(tbl)
        assert agg.late_rows == 0

    def test_late_rows_dropped_and_counted(self, ray_session):
        agg = StreamingTumblingWindow(WIDTH, allowed_lateness_us=0)
        t1 = pa.table({"ts": pa.array([100, 5000], pa.int64()),
                       "event_type": ["a", "a"],
                       "value": [1.0, 1.0]})
        closed = agg.ingest(t1)     # watermark 5000 closes window 0
        assert closed.num_rows == 1
        stale = pa.table({"ts": pa.array([150], pa.int64()),
                          "event_type": ["a"], "value": [9.0]})
        assert agg.ingest(stale).num_rows == 0
        assert agg.late_rows == 1
        tail = agg.flush()          # window 5000 only; stale row gone
        assert tail["sum_value_cents"].to_pylist() == [100]

    def test_state_stays_bounded(self, ray_session):
        """Open-window count is O(lateness/width), not stream length."""
        agg = StreamingTumblingWindow(WIDTH, allowed_lateness_us=3000)
        peak = 0
        for start in range(0, 200_000, 500):
            b = pa.table({"ts": pa.array([start], pa.int64()),
                          "event_type": ["x"], "value": [1.0]})
            agg.ingest(b)
            peak = max(peak, agg.n_open_windows)
        assert peak <= 3000 // WIDTH + 2

    def test_validation(self, ray_session):
        with pytest.raises(ValueError, match="width"):
            StreamingTumblingWindow(0)
        with pytest.raises(ValueError, match="lateness"):
            StreamingTumblingWindow(10, allowed_lateness_us=-1)


# ------------------------------------------------------- sessionizer

from mircv_ray.ops import StreamingSessionizer

GAP = 5_000


def _sess_events(n=4000, seed=9, n_users=25, horizon=2_000_000):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, horizon, n))
    return pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "ts": pa.array(ts, type=pa.int64()),
        "user_id": pa.array(rng.integers(0, n_users, n),
                            type=pa.int64()),
        "value": pa.array(np.round(rng.uniform(0, 10, n), 2)),
    })


def _batch_sessions(tbl: pa.Table) -> set:
    df = (tbl.to_pandas()
          .sort_values(["user_id", "ts", "event_id"]))
    out = set()
    for user, g in df.groupby("user_id"):
        ts = g.ts.to_numpy()
        # leaf-cents per event, exact int sums
        cents = np.trunc(g.value.to_numpy() * 100
                         + np.copysign(0.5, g.value.to_numpy()))             .astype(np.int64)
        new = np.empty(len(ts), dtype=bool)
        new[0] = True
        new[1:] = np.diff(ts) > GAP
        sess = np.cumsum(new) - 1
        for sid in range(sess.max() + 1):
            m = sess == sid
            out.add((int(user), sid, int(m.sum()), int(ts[m].min()),
                     int(ts[m].max()), int(cents[m].sum())))
    return out


def _drive_sessions(tbl: pa.Table, lateness: int,
                    batch_size: int = 193) -> tuple:
    agg = StreamingSessionizer(GAP, allowed_lateness_us=lateness)
    parts = []
    for i in range(0, tbl.num_rows, batch_size):
        parts.append(agg.ingest(tbl.slice(i, batch_size)))
    parts.append(agg.flush())
    out = pa.concat_tables([p for p in parts if p.num_rows])
    cols = [out[c].to_pylist() for c in
            ["user_id", "session_id", "n_events", "start_us",
             "end_us", "sum_value_cents"]]
    got = set(zip(*cols)) if out.num_rows else set()
    return got, agg


class TestStreamingSessionizer:
    def test_ordered_stream_equals_batch(self, ray_session):
        tbl = _sess_events()
        got, agg = _drive_sessions(tbl, lateness=0)
        assert agg.late_rows == 0
        assert got == _batch_sessions(tbl)

    def test_disordered_within_lateness_equals_batch(self, ray_session):
        tbl = _sess_events()
        rng = np.random.default_rng(1)
        jit = tbl["ts"].to_numpy() + rng.integers(0, 800, tbl.num_rows)
        order = np.argsort(jit, kind="stable")
        shuffled = tbl.take(pa.array(order))   # disorder bounded by 800
        got, agg = _drive_sessions(shuffled, lateness=800)
        assert agg.late_rows == 0
        assert got == _batch_sessions(tbl)

    def test_late_bridge_remerges_pending(self, ray_session):
        # ADVICE r4: ts 100,5000,5101 arriving 100/5101/5000 with
        # gap=5000, lateness=800 — the late 5000 bridges the pending
        # [100] and the open [5101]; the batch answer is ONE session
        agg = StreamingSessionizer(GAP, allowed_lateness_us=800)
        for ts, eid in ((100, 0), (5101, 2), (5000, 1)):
            agg.ingest(pa.table({
                "event_id": pa.array([eid], type=pa.int64()),
                "ts": pa.array([ts], type=pa.int64()),
                "user_id": pa.array([7], type=pa.int64()),
                "value": pa.array([1.0])}))
        out = agg.flush()
        assert agg.late_rows == 0
        assert out.num_rows == 1
        assert out["n_events"][0].as_py() == 3
        assert out["start_us"][0].as_py() == 100
        assert out["end_us"][0].as_py() == 5101

    def test_heavy_disorder_within_lateness_equals_batch(self,
                                                         ray_session):
        # jitter exceeding the gap itself: supersede-then-bridge and
        # earlier-disjoint segments all occur; equality must still hold
        tbl = _sess_events(n=3000, seed=3)
        rng = np.random.default_rng(2)
        jit = tbl["ts"].to_numpy() + rng.integers(0, 6000, tbl.num_rows)
        order = np.argsort(jit, kind="stable")
        shuffled = tbl.take(pa.array(order))   # disorder bounded by 6000
        got, agg = _drive_sessions(shuffled, lateness=6000)
        assert agg.late_rows == 0
        assert got == _batch_sessions(tbl)

    def test_state_bounded_and_flush(self, ray_session):
        tbl = _sess_events(horizon=50_000_000)  # sparse: many sessions
        agg = StreamingSessionizer(GAP, 0)
        max_open = 0
        for i in range(0, tbl.num_rows, 193):
            agg.ingest(tbl.slice(i, 193))
            max_open = max(max_open, agg.n_open_sessions)
        assert max_open <= 25                   # <= active users
        tail = agg.flush()
        assert agg.n_open_sessions == 0
        assert tail.num_rows >= 0

    def test_late_segment_dropped_and_counted(self, ray_session):
        agg = StreamingSessionizer(GAP, allowed_lateness_us=0)
        t1 = pa.table({"event_id": pa.array([0, 1], type=pa.int64()),
                       "ts": pa.array([0, 100_000], type=pa.int64()),
                       "user_id": pa.array([1, 2], type=pa.int64()),
                       "value": pa.array([1.0, 1.0])})
        first = agg.ingest(t1)   # watermark 100000 closes user 1 already
        # user 3's whole would-be session sits below the watermark
        t2 = pa.table({"event_id": pa.array([2], type=pa.int64()),
                       "ts": pa.array([10], type=pa.int64()),
                       "user_id": pa.array([3], type=pa.int64()),
                       "value": pa.array([1.0])})
        second = agg.ingest(t2)
        assert agg.late_rows == 1
        out = pa.concat_tables([t for t in (first, second, agg.flush())
                                if t.num_rows])
        assert set(out["user_id"].to_pylist()) == {1, 2}

    def test_validation(self, ray_session):
        with pytest.raises(ValueError):
            StreamingSessionizer(0)
        with pytest.raises(ValueError):
            StreamingSessionizer(10, -1)


from hypothesis import given, settings
from hypothesis import strategies as st


class TestSessionizerProperty:
    # property fuzz of the round-5 disorder fix: ANY event stream whose
    # arrival disorder is bounded by allowed_lateness must reproduce
    # the batch sessionize exactly (sessions as sets; late_rows == 0)
    @given(st.integers(min_value=0, max_value=9999),
           st.integers(min_value=0, max_value=12000),
           st.integers(min_value=10, max_value=400))
    @settings(max_examples=25, deadline=None)
    def test_bounded_disorder_equals_batch(self, seed, jitter_max,
                                           batch_size):
        rng = np.random.default_rng(seed)
        n = 400
        tbl = pa.table({
            "event_id": pa.array(np.arange(n), type=pa.int64()),
            "ts": pa.array(np.sort(rng.integers(0, 150_000, n)),
                           type=pa.int64()),
            "user_id": pa.array(rng.integers(0, 8, n), type=pa.int64()),
            "value": pa.array(np.round(rng.uniform(0, 10, n), 2)),
        })
        jit = tbl["ts"].to_numpy() + rng.integers(
            0, jitter_max + 1, n)
        order = np.argsort(jit, kind="stable")
        got, agg = _drive_sessions(tbl.take(pa.array(order)),
                                   lateness=jitter_max,
                                   batch_size=batch_size)
        assert agg.late_rows == 0
        assert got == _batch_sessions(tbl)


def test_boundary_disorder_exactly_lateness_and_gap(ray_session):
    # round-5 review finding: an event with disorder EXACTLY equal to
    # allowed_lateness sitting EXACTLY gap away must still merge —
    # finalize/late rules are strict (<), not <=
    agg = StreamingSessionizer(100, allowed_lateness_us=50)
    t1 = pa.table({"event_id": pa.array([0, 1], type=pa.int64()),
                   "ts": pa.array([1000, 1150], type=pa.int64()),
                   "user_id": pa.array([1, 2], type=pa.int64()),
                   "value": pa.array([1.0, 1.0])})
    t2 = pa.table({"event_id": pa.array([2], type=pa.int64()),
                   "ts": pa.array([1100], type=pa.int64()),
                   "user_id": pa.array([1], type=pa.int64()),
                   "value": pa.array([1.0])})
    out = pa.concat_tables([x for x in
                            (agg.ingest(t1), agg.ingest(t2), agg.flush())
                            if x.num_rows])
    assert agg.late_rows == 0
    rows = {(r["user_id"], r["n_events"], r["start_us"], r["end_us"])
            for r in out.to_pylist()}
    assert (1, 2, 1000, 1100) in rows          # ONE merged session
    assert (2, 1, 1150, 1150) in rows
    assert len(rows) == 2
