"""Sliding token-window chunking (ops/chunking.py) vs brute force."""

import numpy as np
import pyarrow as pa
import pytest

from mircv_ray.ops import chunk_documents


def _brute(rows, size, stride):
    out = []
    for doc_id, text in rows:
        toks = (text or "").split()
        for cid, start in enumerate(range(0, len(toks), stride)):
            w = toks[start:start + size]
            out.append((doc_id, cid, start, len(w), " ".join(w)))
    return out


def _run(rows, size, stride=None, npart=1):
    import ray.data as rd
    tbl = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string())})
    ds = rd.from_arrow(tbl).repartition(npart)
    got = chunk_documents(ds, size=size, stride=stride).to_pandas()
    got = got.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    return [tuple(r) for r in got.itertuples(index=False)]


@pytest.mark.parametrize("size,stride", [(5, 5), (5, 3), (3, 1), (100, 100)])
def test_vs_brute_force(ray_session, size, stride):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(40):
        n = int(rng.integers(0, 23))
        rows.append((i, " ".join(f"w{rng.integers(100)}" for _ in range(n))))
    rows.append((99, None))
    rows.append((98, "   "))               # whitespace-only -> no chunks
    rows.append((97, "one"))
    rows.append((96, "  padded   spacing\ttab\nnewline  "))
    got = _run(rows, size, stride)
    want = sorted(_brute(rows, size, stride or size))
    assert got == want


def test_overlap_and_tail(ray_session):
    rows = [(0, " ".join(f"t{i}" for i in range(7)))]
    got = _run(rows, size=4, stride=2)
    # starts 0,2,4,6 with lengths 4,4,3,1
    assert [(g[2], g[3]) for g in got] == [(0, 4), (2, 4), (4, 3), (6, 1)]
    assert got[1][4] == "t2 t3 t4 t5"


def test_partitioning_invariance(ray_session):
    rows = [(i, " ".join(f"x{j}" for j in range(i % 11)))
            for i in range(30)]
    assert _run(rows, 4, 3, npart=1) == _run(rows, 4, 3, npart=7)


def test_validation(ray_session):
    import ray.data as rd
    ds = rd.from_items([{"doc_id": 1, "text": "a b"}])
    with pytest.raises(ValueError, match="size"):
        chunk_documents(ds, size=0)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(ds, size=5, stride=0)


class TestSplitSentences:
    """split_sentences (ops/chunking.py) vs a python brute force."""

    @staticmethod
    def _brute(texts, min_chars=1):
        import re
        rows = []
        for i, t in enumerate(texts):
            kept = [s.strip() for s in re.split(r"[.!?]+", t or "")]
            kept = [s for s in kept if len(s) >= min_chars]
            for j, s in enumerate(kept):
                rows.append((i, j, s))
        return rows

    @pytest.mark.parametrize("parts", [1, 5])
    def test_matches_brute_force(self, ray_session, parts):
        import ray.data as rd
        from mircv_ray.ops import split_sentences
        texts = ["One. Two sentences! And... a third? tail no punct",
                 "",
                 None,
                 "only one sentence with no terminal",
                 "a. b. c.",
                 "!!!???...",                       # punctuation only
                 "  padded .  spaced ! "]
        tbl = pa.table({"doc_id": pa.array(range(len(texts)),
                                           type=pa.int64()),
                        "text": pa.array(texts, type=pa.string())})
        out = (split_sentences(rd.from_arrow(tbl).repartition(parts))
               .to_pandas().sort_values(["doc_id", "sent_id"])
               .reset_index(drop=True))
        exp = self._brute(texts)
        assert list(zip(out.doc_id, out.sent_id, out.sentence)) == exp

    def test_min_chars_and_validation(self, ray_session):
        import ray.data as rd
        from mircv_ray.ops import split_sentences
        tbl = pa.table({"doc_id": pa.array([0], type=pa.int64()),
                        "text": pa.array(["ab. c. defg."])})
        out = (split_sentences(rd.from_arrow(tbl), min_chars=2)
               .to_pandas())
        assert list(out.sentence) == ["ab", "defg"]
        assert list(out.sent_id) == [0, 1]
        with pytest.raises(ValueError):
            split_sentences(rd.from_arrow(tbl), min_chars=0)
