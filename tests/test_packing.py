"""Sequence-packing tests: the searchsorted-per-bin kernel vs a
row-by-row greedy reference, edge cases (overflow docs, zero lengths,
exact fits), and the distributed per-shard operator."""

import numpy as np
import pyarrow as pa
import pytest


def brute_pack(lengths, budget):
    bins, offs = [], []
    b, fill = 0, 0
    first = True
    for L in lengths:
        if not first and fill + L > budget:
            b += 1
            fill = 0
        offs.append(fill)
        bins.append(b)
        fill += L
        first = False
    return bins, offs


def check(lengths, budget):
    from mircv_ray.ops import greedy_pack
    bins, offs = greedy_pack(np.asarray(lengths), budget)
    eb, eo = brute_pack(lengths, budget)
    assert bins.tolist() == eb, (lengths, budget, bins.tolist(), eb)
    assert offs.tolist() == eo


class TestGreedyPackKernel:
    def test_hand_cases(self):
        check([3, 3, 3], 6)            # two bins: [3,3],[3]
        check([6], 6)                  # exact fit
        check([7], 6)                  # overflow doc alone
        check([3, 7, 2], 6)            # overflow in the middle
        check([7, 7, 7], 6)            # all overflow: one bin each
        check([0, 0, 6, 0], 6)         # zero-length docs always fit
        check([1, 5, 1, 5, 5, 1], 6)
        check([], 6)

    def test_offsets_are_within_bin_prefix_sums(self):
        from mircv_ray.ops import greedy_pack
        lens = np.array([2, 2, 3, 4, 1, 1, 9, 2])
        bins, offs = greedy_pack(lens, 5)
        for b in np.unique(bins):
            sel = bins == b
            assert offs[sel][0] == 0
            assert (np.diff(offs[sel]) == lens[sel][:-1]).all()

    def test_random_vs_brute(self):
        rng = np.random.default_rng(5)
        for _ in range(50):
            n = int(rng.integers(1, 60))
            lens = rng.integers(0, 12, n).tolist()
            check(lens, int(rng.integers(1, 15)))

    def test_negative_raises(self):
        from mircv_ray.ops import greedy_pack
        with pytest.raises(ValueError):
            greedy_pack(np.array([-1]), 5)


class TestPackSequences:
    def test_distributed_matches_per_shard_brute(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops import pack_sequences
        rng = np.random.default_rng(9)
        n = 300
        ids = rng.permutation(n).astype(np.int64)    # arrival order != id
        lens = rng.integers(0, 40, n).astype(np.int64)
        tbl = pa.table({"doc_id": ids, "doc_len": lens})
        out = pack_sequences(rd.from_arrow(tbl), budget=100,
                             shard_size=64).to_arrow_refs()
        import ray
        got = pa.concat_tables([ray.get(r) for r in out])
        order = np.argsort(got["doc_id"].to_numpy())
        got = got.take(order)
        by_id = dict(zip(ids.tolist(), lens.tolist()))
        sorted_ids = np.sort(ids)
        exp_bins, exp_offs, exp_shard = [], [], []
        for s in range(0, n, 64):
            sh = [i for i in sorted_ids if s <= i < s + 64]
            b, o = brute_pack([by_id[i] for i in sh], 100)
            exp_bins += b
            exp_offs += o
            exp_shard += [s // 64] * len(sh)
        assert got["doc_id"].to_pylist() == sorted_ids.tolist()
        assert got["shard"].to_pylist() == exp_shard
        assert got["bin"].to_pylist() == exp_bins
        assert got["offset"].to_pylist() == exp_offs
        ov = got["overflow"].to_pylist()
        assert ov == [by_id[i] > 100 for i in sorted_ids.tolist()]

    def test_bins_never_cross_shards(self, ray_session):
        import ray
        import ray.data as rd
        from mircv_ray.ops import pack_sequences
        tbl = pa.table({"doc_id": pa.array(range(10), type=pa.int64()),
                        "doc_len": pa.array([1] * 10, type=pa.int64())})
        out = pack_sequences(rd.from_arrow(tbl), budget=1000,
                             shard_size=4)
        got = pa.concat_tables(
            [ray.get(r) for r in out.to_arrow_refs()])
        # tiny docs, huge budget: one bin per shard, never merged across
        pairs = sorted(zip(got["shard"].to_pylist(),
                           got["bin"].to_pylist()))
        assert set(pairs) == {(0, 0), (1, 0), (2, 0)}

    def test_invalid_params(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops import pack_sequences
        tbl = pa.table({"doc_id": [0], "doc_len": [1]})
        with pytest.raises(ValueError):
            pack_sequences(rd.from_arrow(tbl), budget=0, shard_size=4)
        with pytest.raises(ValueError):
            pack_sequences(rd.from_arrow(tbl), budget=4, shard_size=0)
