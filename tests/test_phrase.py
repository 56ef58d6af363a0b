"""Phrase-query tests: the kernel vs a brute-force Python counter, the
end-to-end operator over a built index, and the edge cases (doc
boundaries, repeated terms, single-term degenerate, unknown terms,
tombstoned docs)."""

import numpy as np
import pyarrow as pa
import pytest

from mircv_ray.query.phrase import phrase_match, phrase_occurrence_counts
from mircv_ray.text.tokenizer import tokenize_text


def brute_count(tokens: list[str], terms: list[str]) -> int:
    m = len(terms)
    return sum(1 for i in range(len(tokens) - m + 1)
               if tokens[i:i + m] == terms)


class TestKernel:
    def mk(self, rows):
        return pa.array(rows, type=pa.list_(pa.string()))

    def test_matches_brute_force_random(self):
        rng = np.random.default_rng(3)
        vocab = ["a", "b", "c", "d"]
        rows = [[vocab[int(v)] for v in rng.integers(0, 4, rng.integers(0, 30))]
                for _ in range(50)]
        for terms in (["a", "b"], ["b", "a", "c"], ["d"], ["a", "a"],
                      ["c", "c", "c"], ["a", "b", "c", "d"]):
            got = phrase_occurrence_counts(self.mk(rows), terms)
            want = [brute_count(r, terms) for r in rows]
            assert got.tolist() == want, terms

    def test_overlapping_occurrences(self):
        got = phrase_occurrence_counts(self.mk([["a", "a", "a"]]), ["a", "a"])
        assert got.tolist() == [2]

    def test_window_never_crosses_docs(self):
        # "x y" split across two docs must not count
        got = phrase_occurrence_counts(
            self.mk([["p", "x"], ["y", "q"]]), ["x", "y"])
        assert got.tolist() == [0, 0]

    def test_empty_rows_and_empty_batch(self):
        got = phrase_occurrence_counts(self.mk([[], ["a"], []]), ["a", "b"])
        assert got.tolist() == [0, 0, 0]
        got = phrase_occurrence_counts(self.mk([]), ["a"])
        assert got.tolist() == []

    def test_phrase_longer_than_any_doc(self):
        got = phrase_occurrence_counts(self.mk([["a", "b"]]),
                                       ["a", "b", "c", "d", "e"])
        assert got.tolist() == [0]


DOCS = [
    "binary search tree walk",
    "the binary search loop uses binary search twice",
    "search binary is reversed here",
    "binary alone and search alone",
    "tail ends with binary",           # boundary: next doc starts 'search'
    "search starts this one",
    "merge merge merge sort",
]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data as rd
    from mircv_ray.build import build_index
    from mircv_ray.config import IndexConfig
    out = str(tmp_path_factory.mktemp("phrase") / "idx")
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
    return out, rd.from_arrow(tbl)


def run(built, phrases, **kw):
    out, corpus = built
    t = phrase_match(out, corpus, phrases, **kw).take_all()
    return sorted((r["qid"], r["doc_id"], r["n_occurrences"]) for r in t)


class TestPhraseMatch:
    def test_end_to_end_vs_brute_force(self, built):
        phrases = ["binary search", "search binary", "merge merge",
                   "binary", "nosuchterm here", "binary search tree"]
        got = run(built, phrases)
        want = []
        for qid, p in enumerate(phrases):
            terms = tokenize_text(p, parse=False, squeeze=False)
            for i, doc in enumerate(DOCS):
                toks = tokenize_text(doc, parse=False, squeeze=False)
                n = brute_count(toks, terms)
                if n:
                    want.append((qid, i + 1, n))  # engine ids are 1-based
        assert got == sorted(want)

    def test_boundary_does_not_cross_documents(self, built):
        # doc 4 ends with 'binary', doc 5 starts with 'search' — the
        # phrase exists in the concatenation but in neither document
        got = run(built, ["binary search"])
        assert all(d not in (5, 6) for _, d, _n in got)
        assert (0, 1, 1) in got and (0, 2, 2) in got

    def test_phrase_bm25_matches_direct_formula(self, built):
        # ranked phrase search: occurrence count as tf in the exact
        # reference BM25 formula, df = docs containing the phrase
        import math

        from mircv_ray.build import build_positions_index
        from mircv_ray.build.positions import phrase_bm25
        from mircv_ray.config import IndexConfig
        out, corpus = built
        build_positions_index(out, corpus,
                              IndexConfig(parse=False, squeeze=False,
                                          num_shards=4, salt_buckets=2))
        phrases = ["binary search", "merge merge", "nosuchterm x"]
        t = phrase_bm25(out, phrases, k=10)
        got = sorted((r["qid"], r["doc_id"], round(r["score"], 9))
                     for r in t.to_pylist())
        toks = [tokenize_text(d, parse=False, squeeze=False)
                for d in DOCS]
        n = len(toks)
        avgdl = sum(len(ts) for ts in toks) / n
        want = []
        for qid, p in enumerate(phrases):
            terms = tokenize_text(p, parse=False, squeeze=False)
            occ = {i + 1: brute_count(ts, terms)
                   for i, ts in enumerate(toks)}
            occ = {d: c for d, c in occ.items() if c}
            for d, c in occ.items():
                bj = 0.3 + 0.7 * len(toks[d - 1]) / avgdl
                s = c / (1.5 * bj + c) * math.log10(n / len(occ))
                want.append((qid, d, round(s, 9)))
        assert got == sorted(want)

    def test_single_term_degenerates_to_tf(self, built):
        got = run(built, ["binary"])
        tf = {i + 1: tokenize_text(d, parse=False, squeeze=False)
              .count("binary") for i, d in enumerate(DOCS)}
        want = sorted((0, d, n) for d, n in tf.items() if n)
        assert got == want

    def test_unknown_term_matches_nothing(self, built):
        assert run(built, ["zzz binary"]) == []
        assert run(built, [""]) == []

    def test_tombstoned_doc_excluded(self, built, tmp_path):
        import shutil
        from mircv_ray.build.tombstones import delete_docs
        out, corpus = built
        idx2 = str(tmp_path / "idx2")
        shutil.copytree(out, idx2)
        delete_docs(idx2, [2])  # the strongest 'binary search' doc
        t = phrase_match(idx2, corpus, ["binary search"]).take_all()
        ids = {r["doc_id"] for r in t}
        assert 2 not in ids and 1 in ids


@pytest.fixture(scope="module")
def positional(built):
    from mircv_ray.build.positions import build_positions_index
    from mircv_ray.config import IndexConfig
    out, corpus = built
    res = build_positions_index(
        out, corpus, IndexConfig(parse=False, squeeze=False,
                                 num_shards=4, salt_buckets=2))
    return out, corpus, res


class TestPositionalSidecar:
    def test_round_trip_positions(self, positional):
        from mircv_ray.build.positions import read_term_positions
        out, corpus, _ = positional
        # brute-force expected per-term (doc -> positions)
        want: dict[str, dict[int, list[int]]] = {}
        for i, doc in enumerate(DOCS):
            for p, t in enumerate(tokenize_text(doc, parse=False,
                                                squeeze=False)):
                want.setdefault(t, {}).setdefault(i + 1, []).append(p)
        for term, docpos in want.items():
            got = read_term_positions(out, term, 4, 2)
            assert got is not None, term
            ids, cnts, pos = got
            assert sorted(ids.tolist()) == sorted(docpos)
            off = np.cumsum(cnts) - cnts
            for j, d in enumerate(ids.tolist()):
                assert pos[off[j]:off[j] + cnts[j]].tolist() == \
                    docpos[d], (term, d)

    def test_positional_equals_scan_verify(self, positional):
        from mircv_ray.build.positions import phrase_match_positional
        out, corpus, _ = positional
        phrases = ["binary search", "search binary", "merge merge",
                   "binary", "nosuchterm here", "binary search tree",
                   "merge merge merge"]
        got = phrase_match_positional(out, phrases)
        got = sorted(zip(got["qid"].to_pylist(), got["doc_id"].to_pylist(),
                         got["n_occurrences"].to_pylist()))
        want = run((out, corpus), phrases)
        assert got == want

    def test_resume_skips_done_partitions(self, positional):
        from mircv_ray.build.positions import build_positions_index
        from mircv_ray.config import IndexConfig
        out, corpus, _ = positional
        res = build_positions_index(
            out, corpus, IndexConfig(parse=False, squeeze=False,
                                     num_shards=4, salt_buckets=2))
        # either the file-count fast path fired, or every re-seen
        # partition reported already-published (rows = -1 markers)
        assert res.get("resumed") is True or res.get("rows", 0) <= 0

    def test_tombstones_respected(self, positional, tmp_path):
        import shutil
        from mircv_ray.build.positions import phrase_match_positional
        from mircv_ray.build.tombstones import delete_docs
        out, corpus, _ = positional
        idx2 = str(tmp_path / "idx3")
        shutil.copytree(out, idx2)
        delete_docs(idx2, [2])
        got = phrase_match_positional(idx2, ["binary search"])
        assert 2 not in got["doc_id"].to_pylist()


class TestPrefixTerms:
    def test_prefix_expansion_vs_brute_force(self, built):
        from mircv_ray.query.engine import IndexReader
        out, _ = built
        rdr = IndexReader(out)
        vocab = sorted({t for d in DOCS
                        for t in tokenize_text(d, parse=False,
                                               squeeze=False)})
        for prefix in ("s", "se", "search", "bin", "merge", "zz", "b"):
            want = [t for t in vocab if t.startswith(prefix)]
            assert rdr.prefix_terms(prefix) == want, prefix
        assert rdr.prefix_terms("") == []
        assert rdr.prefix_terms("x" * 64) == []


def brute_min_span(tokens: list[str], terms: list[str]) -> int | None:
    """Smallest window [i, j] covering every term at least once."""
    best = None
    for i in range(len(tokens)):
        need = set(terms)
        for j in range(i, len(tokens)):
            need.discard(tokens[j])
            if not need:
                if best is None or j - i + 1 < best:
                    best = j - i + 1
                break
    return best


class TestProximity:
    def test_min_span_vs_brute_force(self, positional):
        from mircv_ray.build.positions import proximity_min_span
        out, corpus, _ = positional
        queries = ["binary search", "search walk", "merge sort",
                   "binary", "tree walk binary", "nosuch binary"]
        got = proximity_min_span(out, queries)
        got = sorted(zip(got["qid"].to_pylist(),
                         got["doc_id"].to_pylist(),
                         got["min_span"].to_pylist()))
        want = []
        for qid, q in enumerate(queries):
            terms = sorted(set(tokenize_text(q, parse=False,
                                             squeeze=False)))
            for i, doc in enumerate(DOCS):
                toks = tokenize_text(doc, parse=False, squeeze=False)
                s = brute_min_span(toks, terms)
                if s is not None:
                    want.append((qid, i + 1, s))
        assert got == sorted(want)

    def test_random_streams_vs_brute_force(self, positional, tmp_path,
                                           ray_session):
        # fresh random corpus: the vectorized minimal-cover must equal
        # the quadratic brute force everywhere
        import ray.data as rd
        from mircv_ray.build import build_index
        from mircv_ray.build.positions import (build_positions_index,
                                               proximity_min_span)
        from mircv_ray.config import IndexConfig
        rng = np.random.default_rng(11)
        vocab = ["a", "b", "c", "d", "e"]
        docs = [" ".join(vocab[int(v)]
                         for v in rng.integers(0, 5, rng.integers(1, 40)))
                for _ in range(40)]
        tbl = pa.table({"repo": ["r"] * 40,
                        "path": [f"p{i:02d}" for i in range(40)],
                        "commit": ["c"] * 40, "lang": ["t"] * 40,
                        "content": docs})
        out = str(tmp_path / "pidx")
        cfg = IndexConfig(parse=False, squeeze=False, num_shards=4,
                          salt_buckets=2)
        build_index(rd.from_arrow(tbl), out, cfg)
        build_positions_index(out, rd.from_arrow(tbl), cfg)
        queries = ["a b", "a b c", "d e a", "e", "a a b"]
        got = proximity_min_span(out, queries)
        got = sorted(zip(got["qid"].to_pylist(),
                         got["doc_id"].to_pylist(),
                         got["min_span"].to_pylist()))
        want = []
        for qid, q in enumerate(queries):
            terms = sorted(set(q.split()))
            for i, doc in enumerate(docs):
                s = brute_min_span(doc.split(), terms)
                if s is not None:
                    want.append((qid, i + 1, s))
        assert got == sorted(want)
