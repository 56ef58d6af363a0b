"""upsert_docs: replace documents by key via delta build + merge +
tombstone of superseded rows."""

import numpy as np
import pyarrow as pa
import pytest


def _corpus(texts: dict) -> pa.Table:
    paths = sorted(texts)
    return pa.table({
        "repo": pa.array(["r"] * len(paths)),
        "path": pa.array(paths),
        "lang": pa.array(["txt"] * len(paths)),
        "content": pa.array([texts[p] for p in paths]),
    })


@pytest.fixture()
def cfg():
    from mircv_ray.config import IndexConfig
    return IndexConfig(parse=False, squeeze=False, codec="vbyte",
                       num_shards=2, salt_buckets=1)


class TestUpsertDocs:
    def _dump(self, idx):
        from mircv_ray.query.dump import dump_postings
        df = dump_postings(idx, docno_offset=0,
                           apply_tombstones=True).to_pandas()
        return {(r.term, r.doc_id): r.tf for r in df.itertuples()}

    def test_replaces_and_appends(self, ray_session, cfg, tmp_path):
        import ray.data as rd
        from mircv_ray.build import build_index, upsert_docs
        base_texts = {"a.txt": "apple banana apple",
                      "b.txt": "cherry cherry",
                      "c.txt": "date fig"}
        build_index(rd.from_arrow(_corpus(base_texts)),
                    str(tmp_path / "base"), cfg)
        new = {"b.txt": "banana grape",        # replaces b.txt
               "z.txt": "kiwi kiwi kiwi"}      # brand-new key
        stats = upsert_docs(str(tmp_path / "base"),
                            rd.from_arrow(_corpus(new)),
                            str(tmp_path / "up"), cfg)
        assert stats["n_superseded"] == 1
        got = self._dump(str(tmp_path / "up"))
        # unchanged docs keep their postings/ids (a=1, c=3 in key order)
        assert got[("apple", 1)] == 2 and got[("banana", 1)] == 1
        assert got[("date", 3)] == 1 and got[("fig", 3)] == 1
        # old b.txt invisible
        assert ("cherry", 2) not in got
        # new versions appended after the base id space (n_base=3):
        # delta key order b.txt < z.txt -> ids 4, 5
        assert got[("banana", 4)] == 1 and got[("grape", 4)] == 1
        assert got[("kiwi", 5)] == 3
        assert len(got) == 7

    def test_vacuum_makes_physical(self, ray_session, cfg, tmp_path):
        import ray.data as rd
        from mircv_ray.build import (build_index, load_tombstones,
                                     upsert_docs, vacuum_index)
        base_texts = {"a.txt": "x y", "b.txt": "y z"}
        build_index(rd.from_arrow(_corpus(base_texts)),
                    str(tmp_path / "base"), cfg)
        upsert_docs(str(tmp_path / "base"),
                    rd.from_arrow(_corpus({"a.txt": "w w"})),
                    str(tmp_path / "up"), cfg)
        assert len(load_tombstones(str(tmp_path / "up"))) == 1
        vacuum_index(str(tmp_path / "up"), str(tmp_path / "vac"))
        got = self._dump(str(tmp_path / "vac"))
        # survivors renumber densely: b.txt -> 1, new a.txt -> 2
        assert got == {("y", 1): 1, ("z", 1): 1, ("w", 2): 2}
        assert len(load_tombstones(str(tmp_path / "vac"))) == 0

    def test_pure_insert_no_tombstones(self, ray_session, cfg, tmp_path):
        import ray.data as rd
        from mircv_ray.build import (build_index, load_tombstones,
                                     upsert_docs)
        build_index(rd.from_arrow(_corpus({"a.txt": "p q"})),
                    str(tmp_path / "base"), cfg)
        stats = upsert_docs(str(tmp_path / "base"),
                            rd.from_arrow(_corpus({"n.txt": "r"})),
                            str(tmp_path / "up"), cfg)
        assert stats["n_superseded"] == 0
        assert len(load_tombstones(str(tmp_path / "up"))) == 0
