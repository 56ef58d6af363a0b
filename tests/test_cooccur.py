"""Windowed co-occurrence counts: brute-force parity, partition
invariance, window-1 ≡ adjacent bigrams."""
import re
from collections import Counter, defaultdict

import pyarrow as pa
import pyarrow.compute as pc


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the the the spam spam ham"),
    (2, "one"),
    (3, ""),
    (4, None),
    (5, "punct! splits; the TOKENS like.the oracle does"),
]


def _toks(t):
    return [x for x in re.split(r"[^a-z0-9]+", (t or "").lower()) if x]


def _brute(docs, window, min_count=1):
    cnt, wsum = Counter(), defaultdict(float)
    for _, t in docs:
        toks = _toks(t)
        for i in range(len(toks)):
            for d in range(1, window + 1):
                if i + d < len(toks):
                    cnt[(toks[i], toks[i + d])] += 1
                    wsum[(toks[i], toks[i + d])] += 1.0 / d
    return {k: (c, round(wsum[k], 4)) for k, c in cnt.items()
            if c >= min_count}


def _run(docs, parts=3, **kw):
    import ray
    import ray.data as rd
    from mircv_ray.ops import cooccurrence_counts
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
        "text": pa.array([t for _, t in docs], type=pa.string()),
    })).repartition(parts)
    out = cooccurrence_counts(ds, **kw)
    t = pa.concat_tables(ray.get(out.to_arrow_refs()),
                         promote_options="default").combine_chunks()
    return {(t["term_a"][i].as_py(), t["term_b"][i].as_py()):
            (t["pair_count"][i].as_py(),
             round(t["glove_weight"][i].as_py(), 4))
            for i in range(t.num_rows)}


def test_cooccurrence_equals_brute_force(ray_session):
    for window in (1, 3, 5):
        exp = _brute(DOCS, window)
        got = _run(DOCS, window=window)
        assert got == exp, window


def test_cooccurrence_min_count(ray_session):
    exp = _brute(DOCS, 4, min_count=2)
    got = _run(DOCS, window=4, min_count=2)
    assert got == exp
    assert all(c >= 2 for c, _ in got.values())


def test_cooccurrence_partition_invariance(ray_session):
    a = _run(DOCS, parts=1, window=3)
    b = _run(DOCS, parts=6, window=3)
    assert a == b


def test_cooccurrence_validation(ray_session):
    import pytest
    import ray.data as rd
    from mircv_ray.ops import cooccurrence_counts
    ds = rd.from_items([{"text": "a b"}])
    with pytest.raises(ValueError):
        cooccurrence_counts(ds, window=0)
    with pytest.raises(ValueError):
        cooccurrence_counts(ds, min_count=0)
