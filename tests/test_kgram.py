"""K-gram wildcard tests: the gram-filtered vectorized matcher vs
brute-force fnmatch over random vocabularies, anchoring/edge cases,
gram-index integrity, and the end-to-end scored operator."""

import fnmatch

import numpy as np
import pyarrow as pa
import pytest


class FakeLex:
    def __init__(self, terms):
        self.terms = np.array(sorted(set(terms)), dtype="S64")

    def __contains__(self, term):
        t = np.bytes_(term.encode())
        i = int(np.searchsorted(self.terms, t))
        return i < len(self.terms) and self.terms[i] == t


def brute(vocab, pattern):
    return sorted(t for t in set(vocab) if fnmatch.fnmatchcase(t, pattern))


def check(vocab, pattern):
    from mircv_ray.query.kgram import wildcard_terms
    got = wildcard_terms(FakeLex(vocab), pattern)
    want = brute(vocab, pattern)
    assert got == want, (pattern, got, want)


VOCAB = ["merge", "merges", "merged", "emerge", "mer", "sort", "resort",
         "sorted", "join", "rejoin", "joining", "window", "windows",
         "w", "ww", "www", "a", "ab", "abc", "table", "stable",
         "tablet", "scan", "scans", "s"]


class TestWildcardKernel:
    def test_prefix(self):
        for p in ["mer*", "s*", "x*", "merge*", "w*"]:
            check(VOCAB, p)

    def test_suffix(self):
        for p in ["*ing", "*ge", "*s", "*w", "*zzz", "*table"]:
            check(VOCAB, p)

    def test_infix_contains(self):
        for p in ["*erg*", "*or*", "*a*", "*tab*", "*q*"]:
            check(VOCAB, p)

    def test_multi_star(self):
        for p in ["m*e", "s*d", "w*w", "s*a*", "*e*e*", "r*j*n",
                  "m*r*e*", "*o*i*"]:
            check(VOCAB, p)

    def test_exact_and_degenerate(self):
        check(VOCAB, "merge")     # no star: exact lookup
        check(VOCAB, "nosuch")
        check(VOCAB, "*")         # all-stars matches everything
        check(VOCAB, "**")
        from mircv_ray.query.kgram import wildcard_terms
        assert wildcard_terms(FakeLex(VOCAB), "") == []
        assert wildcard_terms(FakeLex(VOCAB), "x" * 64) == []

    def test_greedy_suffix_anchoring(self):
        # greedy leftmost must not eat the suffix's occurrence
        check(["axab", "ab", "aab", "abab"], "*ab")
        check(["abxab", "abab", "abba"], "ab*ab")
        # overlap: prefix+suffix longer than the term
        check(["aba", "abba", "ababa"], "ab*ba")

    def test_random_vocab_vs_brute_force(self):
        rng = np.random.default_rng(11)
        alpha = "abc"
        vocab = ["".join(alpha[int(c)] for c in
                         rng.integers(0, 3, rng.integers(1, 9)))
                 for _ in range(400)]
        pats = []
        for _ in range(60):
            w = "".join(alpha[int(c)] for c in
                        rng.integers(0, 3, rng.integers(1, 7)))
            k = int(rng.integers(0, 3))
            posns = sorted(rng.integers(0, len(w) + 1, k).tolist())
            for p in reversed(posns):
                w = w[:p] + "*" + w[p:]
            if rng.integers(0, 2):
                w = "*" + w
            if rng.integers(0, 2):
                w = w + "*"
            pats.append(w)
        for p in pats:
            check(vocab, p)

    def test_length_edges(self):
        long = "x" * 63
        check([long, "x" * 62, "y" + "x" * 62], "x*x")
        check([long, "x" * 62 + "y"], "*y")

    def test_gram_index_cache_identity_guard(self):
        from mircv_ray.query import kgram
        lex = FakeLex(["merge", "sort"])
        stale = FakeLex(["zzz"]).terms
        kgram._gram_cache.clear()
        m, lens = kgram._term_matrix(stale)
        kgram._gram_cache[id(lex.terms)] = (
            np.array([0], np.uint32), np.array([0, 1]),
            np.array([0]), m, lens, stale)
        assert kgram.wildcard_terms(lex, "mer*e") == ["merge"]
        a = kgram._kgram_index(lex.terms)
        b = kgram._kgram_index(lex.terms)
        assert a[0] is b[0]

    def test_gram_index_values(self):
        # hand-check the gram lists for a 2-term vocabulary
        from mircv_ray.query.kgram import _kgram_index
        lex = FakeLex(["ab", "ba"])
        ugrams, starts, rows, m, lens = _kgram_index(lex.terms)
        def unpack(g):
            return bytes([g >> 16, (g >> 8) & 0xFF, g & 0xFF])
        got = {}
        for i, g in enumerate(ugrams):
            got[unpack(int(g))] = sorted(
                rows[starts[i]:starts[i + 1]].tolist())
        # sorted vocab: row0='ab', row1='ba'
        assert got == {b"$ab": [0], b"ab$": [0],
                       b"$ba": [1], b"ba$": [1]}


DOCS = ["merge sort fast", "merge join slow", "sort the table",
        "join the row", "key value scan"]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data as rd
    from mircv_ray.build import build_index
    from mircv_ray.config import IndexConfig
    out = str(tmp_path_factory.mktemp("kgram") / "idx")
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


class TestBm25Wildcard:
    def test_expansion_and_scoring(self, built):
        from mircv_ray.query.kgram import bm25_wildcard
        t, exp = bm25_wildcard(built, ["*ort", "*oi*", "s*w", "*zzz*"],
                               k=10, parse=False, squeeze=False)
        assert exp[0] == ["sort"]
        assert exp[1] == ["join"]
        assert exp[2] == ["slow"]
        assert exp[3] == []
        by_q = {}
        for q, d in zip(t["qid"].to_pylist(), t["doc_id"].to_pylist()):
            by_q.setdefault(q, set()).add(d)
        assert by_q[0] == {1, 3}       # docs containing 'sort'
        assert by_q[1] == {2, 4}       # docs containing 'join'
        assert by_q[2] == {2}          # doc containing 'slow'
        assert 3 not in by_q

    def test_matches_prefix_engine(self, built):
        # 'pre*' through the k-gram path == the lexicon range scan
        from mircv_ray.config import QueryConfig
        from mircv_ray.query import QueryEngine
        from mircv_ray.query.kgram import wildcard_terms
        eng = QueryEngine(built, QueryConfig(standard="BM25", k=10,
                                             parse=False, squeeze=False))
        for pref in ["s", "me", "jo", "zz", "t"]:
            assert (wildcard_terms(eng.reader._lex, pref + "*")
                    == eng.reader.prefix_terms(pref))
