"""Fuzzy term-matching tests: the vectorized ED<=1 lexicon filter vs
brute-force Levenshtein over random vocabularies, transposition
exclusion, and the end-to-end scored operator."""

import numpy as np
import pyarrow as pa
import pytest


def levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class FakeLex:
    def __init__(self, terms):
        self.terms = np.array(sorted(set(terms)), dtype="S64")


def check(vocab, query):
    from mircv_ray.query.fuzzy import ed1_terms
    got = ed1_terms(FakeLex(vocab), query)
    want = sorted(t for t in set(vocab)
                  if levenshtein(t, query) <= 1)
    assert got == want, (query, got, want)


class TestEd1Kernel:
    def test_hand_cases(self):
        vocab = ["merge", "marge", "merges", "mere", "mergee", "sort",
                 "sortt", "ort", "so", "s", "join", "jion", "jon",
                 "a", "ab", "ba", "abc"]
        for q in ["merge", "mergee", "merg", "sort", "jion", "join",
                  "ab", "ba", "a", "zzz", "xyzzy"]:
            check(vocab, q)

    def test_transposition_is_distance_two(self):
        from mircv_ray.query.fuzzy import ed1_terms
        assert ed1_terms(FakeLex(["join"]), "jion") == []
        assert ed1_terms(FakeLex(["jion", "join"]), "jion") == ["jion"]

    def test_random_vocab_vs_brute_force(self):
        rng = np.random.default_rng(7)
        alpha = "abcd"
        vocab = ["".join(alpha[int(c)] for c in
                         rng.integers(0, 4, rng.integers(1, 8)))
                 for _ in range(300)]
        queries = ["".join(alpha[int(c)] for c in
                           rng.integers(0, 4, rng.integers(1, 8)))
                   for _ in range(40)]
        for q in queries:
            check(vocab, q)

    def test_cache_identity_guard(self):
        # a recycled id() must not serve another array's cached state:
        # poison the cache under this array's id with a stale entry
        # whose stored identity differs — the guard must recompute
        from mircv_ray.query import fuzzy
        lex = FakeLex(["merge", "sort"])
        stale = FakeLex(["zzz"]).terms
        fuzzy._len_cache.clear()
        fuzzy._len_cache[id(lex.terms)] = (
            np.array([0]), np.array([3]),
            np.ascontiguousarray(stale).view(np.uint8).reshape(-1, 64),
            stale)
        assert fuzzy.ed1_terms(lex, "merge") == ["merge"]
        # and a genuine hit (same identity) is served from cache
        order0, _, _ = fuzzy._length_index(lex.terms)
        order1, _, _ = fuzzy._length_index(lex.terms)
        assert order0 is order1

    def test_length_edges(self):
        from mircv_ray.query.fuzzy import ed1_terms
        assert ed1_terms(FakeLex(["a", "ab"]), "") == []
        long = "x" * 63
        check([long, long[:-1], "x" * 62 + "y", "y" + "x" * 62], long)


DOCS = ["merge sort fast", "merge join slow", "sort the table",
        "join the row", "key value scan"]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data as rd
    from mircv_ray.build import build_index
    from mircv_ray.config import IndexConfig
    out = str(tmp_path_factory.mktemp("fuzzy") / "idx")
    tbl = pa.table({
        "repo": ["r"] * len(DOCS),
        "path": [f"f{i}" for i in range(len(DOCS))],
        "commit": ["c"] * len(DOCS),
        "lang": ["py"] * len(DOCS),
        "content": DOCS,
    })
    build_index(rd.from_arrow(tbl), out,
                IndexConfig(parse=False, squeeze=False, num_shards=4,
                            salt_buckets=2))
    return out


class TestBm25Fuzzy:
    def test_expansion_and_scoring(self, built):
        from mircv_ray.query.fuzzy import bm25_fuzzy
        t, exp = bm25_fuzzy(built, ["mergee", "sorr", "zzz"], k=10,
                            parse=False, squeeze=False)
        assert exp[0] == ["merge"]
        assert exp[1] == ["sort"]      # 'sorr'->sort sub; not 'slow'
        assert exp[2] == []
        by_q = {}
        for q, d in zip(t["qid"].to_pylist(), t["doc_id"].to_pylist()):
            by_q.setdefault(q, set()).add(d)
        assert by_q[0] == {1, 2}       # docs containing 'merge'
        assert by_q[1] == {1, 3}       # docs containing 'sort'
        assert 2 not in by_q

    def test_exact_term_includes_itself(self, built):
        from mircv_ray.query.fuzzy import bm25_fuzzy
        _, exp = bm25_fuzzy(built, ["key"], k=10, parse=False,
                            squeeze=False)
        assert "key" in exp[0]
