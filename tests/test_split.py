"""hash_split: deterministic, partition-independent dataset splitting."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from mircv_ray.ops import hash_split

FR = {"train": 0.8, "val": 0.1, "test": 0.1}


def _collect(ds):
    import ray
    tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    t = pa.concat_tables(tbls).combine_chunks()
    return t.take(pc.sort_indices(t["doc_id"]))


def _ids(n=50_000):
    return pa.table({"doc_id": pa.array(np.arange(n), type=pa.int64())})


class TestHashSplit:
    @pytest.mark.parametrize("mode", ["crc32", "knuth32"])
    def test_fractions_respected(self, ray_session, mode):
        import ray.data as rd
        got = _collect(hash_split(rd.from_arrow(_ids()), "doc_id", FR,
                                  hash_mode=mode))
        counts = dict(zip(*np.unique(got["split"].to_numpy(
            zero_copy_only=False), return_counts=True)))
        n = got.num_rows
        for name, f in FR.items():
            assert abs(counts[name] / n - f) < 0.01, (mode, name)

    @pytest.mark.parametrize("mode", ["crc32", "knuth32"])
    def test_partition_independent(self, ray_session, mode):
        import ray.data as rd
        t = _ids(8_000)
        a = _collect(hash_split(rd.from_arrow(t).repartition(1),
                                "doc_id", FR, hash_mode=mode))
        b = _collect(hash_split(rd.from_arrow(t).repartition(32),
                                "doc_id", FR, hash_mode=mode))
        assert a.equals(b)

    def test_complete_and_disjoint(self, ray_session):
        import ray.data as rd
        got = _collect(hash_split(rd.from_arrow(_ids(10_000)),
                                  "doc_id", FR))
        assert got.num_rows == 10_000           # every row assigned once
        assert set(got["split"].to_pylist()) == set(FR)

    def test_salt_changes_assignment(self, ray_session):
        import ray.data as rd
        t = _ids(5_000)
        a = _collect(hash_split(rd.from_arrow(t), "doc_id", FR, salt=0))
        b = _collect(hash_split(rd.from_arrow(t), "doc_id", FR, salt=7))
        assert a["split"].to_pylist() != b["split"].to_pylist()

    def test_string_ids(self, ray_session):
        import ray.data as rd
        t = pa.table({"doc_id": pa.array([f"doc-{i}" for i in
                                          range(2_000)])})
        got = hash_split(rd.from_arrow(t), "doc_id",
                         {"a": 0.5, "b": 0.5}).take_all()
        assert len(got) == 2_000

    def test_bad_fractions_raise(self, ray_session):
        import ray.data as rd
        with pytest.raises(ValueError, match="sum"):
            hash_split(rd.from_arrow(_ids(10)), "doc_id",
                       {"a": 0.5, "b": 0.1})
        with pytest.raises(ValueError, match="hash_mode"):
            hash_split(rd.from_arrow(_ids(10)), "doc_id",
                       {"a": 1.0}, hash_mode="md5")
