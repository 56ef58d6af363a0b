"""Boolean-NOT retrieval and faceted-search tests vs brute force."""

import math

import numpy as np
import pyarrow as pa
import pytest

from mircv_ray.text.tokenizer import tokenize_text

DOCS = [
    ("py", "merge sort fast merge"),
    ("py", "merge join slow"),
    ("go", "sort the table"),
    ("go", "join the row merge"),
    ("rs", "key value scan sort"),
    ("rs", "the a the a"),
]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data as rd
    from mircv_ray.build import build_index
    from mircv_ray.config import IndexConfig
    out = str(tmp_path_factory.mktemp("boolfacet") / "idx")
    tbl = pa.table({
        "repo": ["r"] * len(DOCS),
        "path": [f"f{i}" for i in range(len(DOCS))],
        "commit": ["c"] * len(DOCS),
        "lang": [lang for lang, _ in DOCS],
        "content": [text for _, text in DOCS],
    })
    build_index(rd.from_arrow(tbl), out,
                IndexConfig(parse=False, squeeze=False, num_shards=4,
                            salt_buckets=2))
    return out


def toks_of():
    return [tokenize_text(t, parse=False, squeeze=False)
            for _, t in DOCS]


def brute_boolean(pos, neg, k=10):
    toks = toks_of()
    n = len(toks)
    vocab = set(t for ts in toks for t in ts)
    known_pos = sorted(set(p for p in pos if p in vocab))
    if not known_pos:
        return []
    avgdl = sum(len(ts) for ts in toks) / n
    df = {t: sum(t in ts for ts in toks) for t in vocab}
    out = []
    for d, ts in enumerate(toks):
        if any(t not in ts for t in known_pos):
            continue
        if any(t in ts for t in neg if t in vocab):
            continue
        bj = 0.3 + 0.7 * len(ts) / avgdl
        s = 0.0
        for t in pos:           # duplicates score twice
            if t not in vocab or t not in ts:
                continue
            f = ts.count(t)
            s += f / (1.5 * bj + f) * math.log10(n / df[t])
        out.append((d + 1, s))
    out.sort(key=lambda x: (-x[1], x[0]))
    return [(d, round(s, 9)) for d, s in out[:k]]


class TestBoolean:
    @pytest.mark.parametrize("pos,neg", [
        (["merge"], ["join"]),
        (["merge", "sort"], []),
        (["sort"], ["the"]),
        (["the"], ["a"]),               # every 'the' doc also has 'a'?
        (["merge", "merge"], ["row"]),  # duplicate positive
        (["zzz"], ["merge"]),           # unknown positive -> empty
        (["merge"], ["zzz"]),           # unknown negative ignored
    ])
    def test_vs_brute_force(self, built, pos, neg):
        from mircv_ray.config import QueryConfig
        from mircv_ray.query import QueryEngine
        from mircv_ray.query.boolean import score_terms_boolean
        eng = QueryEngine(built, QueryConfig(standard="BM25", k=10,
                                             parse=False, squeeze=False))
        got = [(d, round(s, 9))
               for d, s in score_terms_boolean(eng, pos, neg)]
        assert got == brute_boolean(pos, neg)


class TestFacets:
    def test_counts_vs_brute_force(self, built, ray_session):
        from mircv_ray.query.facets import facet_counts
        queries = [["merge", "sort"], ["the"], ["zzz"], ["key"]]
        t = facet_counts(built, queries, facet_col="lang")
        got = sorted(zip(t["qid"].to_pylist(), t["facet"].to_pylist(),
                         t["n_docs"].to_pylist()))
        toks = toks_of()
        want = {}
        for qid, terms in enumerate(queries):
            for d, ts in enumerate(toks):
                if any(t in ts for t in terms):
                    key = (qid, DOCS[d][0])
                    want[key] = want.get(key, 0) + 1
        assert got == sorted((q, f, n) for (q, f), n in want.items())
