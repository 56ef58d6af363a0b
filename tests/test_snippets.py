"""Snippet-extraction tests: best-window selection (argmin span, then
start) vs quadratic brute force, context clamping at doc edges, and the
end-to-end candidate-only slicing operator over a built index."""

import numpy as np
import pyarrow as pa
import pytest

from mircv_ray.build.positions import _min_cover_windows
from mircv_ray.text.tokenizer import tokenize_text

CTX = 3


def brute_best(tokens, terms):
    """(span, start) of the best minimal-cover window, or None."""
    terms = sorted(set(terms))
    best = None
    for s in range(len(tokens)):
        need = set(terms)
        for e in range(s, len(tokens)):
            need.discard(tokens[e])
            if not need:
                cand = (e - s + 1, s)
                if best is None or cand < best:
                    best = cand
                break
    return best


def keysets_of(docs_tokens, terms):
    """Composite (docId << 32 | pos) keysets (docId = row index + 1)."""
    out = []
    for t in terms:
        keys = [(d + 1) << 32 | p
                for d, toks in enumerate(docs_tokens)
                for p, tok in enumerate(toks) if tok == t]
        out.append(np.array(sorted(keys), dtype=np.int64))
    return out


class TestMinCoverWindows:
    def check(self, docs_tokens, terms):
        terms = sorted(set(terms))
        ks = keysets_of(docs_tokens, terms)
        if any(len(k) == 0 for k in ks):
            return  # operator-level code skips absent terms
        docs, spans, starts = _min_cover_windows(ks)
        got = {int(d): (int(sp), int(st))
               for d, sp, st in zip(docs, spans, starts)}
        want = {}
        for d, toks in enumerate(docs_tokens):
            b = brute_best(toks, terms)
            if b is not None:
                want[d + 1] = b
        assert got == want, (terms, docs_tokens)

    def test_tie_breaks_to_earliest_window(self):
        docs = [["a", "b", "x", "a", "b"]]
        docs_, spans, starts = _min_cover_windows(
            keysets_of(docs, ["a", "b"]))
        assert spans.tolist() == [2] and starts.tolist() == [0]

    def test_random_streams_vs_brute_force(self):
        rng = np.random.default_rng(11)
        vocab = ["a", "b", "c", "d", "e"]
        for trial in range(40):
            docs = [[vocab[int(v)]
                     for v in rng.integers(0, 5, rng.integers(1, 25))]
                    for _ in range(6)]
            for terms in (["a"], ["a", "b"], ["c", "d", "e"],
                          ["a", "a", "b"], ["e", "b", "a", "c"]):
                self.check(docs, terms)


DOCS = [
    "binary search tree walk",
    "the binary search loop uses binary search twice",
    "search binary is reversed here",
    "binary alone and search alone",
    "tail ends with binary",
    "search starts this one",
    "merge merge merge sort",
]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data as rd
    from mircv_ray.build import build_index
    from mircv_ray.build.positions import build_positions_index
    from mircv_ray.config import IndexConfig
    out = str(tmp_path_factory.mktemp("snip") / "idx")
    tbl = pa.table({
        "repo": ["r"] * len(DOCS),
        "path": [f"f{i}" for i in range(len(DOCS))],
        "commit": ["c"] * len(DOCS),
        "lang": ["py"] * len(DOCS),
        "content": DOCS,
    })
    cfg = IndexConfig(parse=False, squeeze=False, num_shards=4,
                      salt_buckets=2)
    build_index(rd.from_arrow(tbl), out, cfg)
    build_positions_index(out, rd.from_arrow(tbl), cfg)
    return out, rd.from_arrow(tbl)


def brute_rows(queries, ctx=CTX):
    rows = set()
    for qid, q in enumerate(queries):
        terms = sorted(set(tokenize_text(q, parse=False, squeeze=False)))
        if not terms:
            continue
        toksets = [tokenize_text(d, parse=False, squeeze=False)
                   for d in DOCS]
        if any(all(t not in toks for toks in toksets) for t in terms):
            continue
        for i, toks in enumerate(toksets):
            b = brute_best(toks, terms)
            if b is None:
                continue
            span, s = b
            snip = " ".join(toks[max(0, s - ctx):s + span + ctx])
            rows.add((qid, i + 1, s, span, snip))
    return rows


def run(built, queries, **kw):
    out, corpus = built
    from mircv_ray.query.snippets import snippet_extract
    t = snippet_extract(out, corpus, queries, ctx=CTX, **kw).take_all()
    return set((r["qid"], r["doc_id"], r["start"], r["min_span"],
                r["snippet"]) for r in t)


class TestSnippetExtract:
    def test_end_to_end_vs_brute_force(self, built):
        queries = ["binary search", "search", "merge sort",
                   "walk alone", "nosuchterm", "binary binary",
                   "twice the uses"]
        assert run(built, queries) == brute_rows(queries)

    def test_context_clamps_at_doc_edges(self, built):
        got = run(built, ["tail"])
        # 'tail' is doc 5's first token: left context clamps to 0,
        # right context takes the next 3 tokens
        assert got == {(0, 5, 0, 1, "tail ends with binary")}
        got = run(built, ["sort"])
        assert got == {(0, 7, 3, 1, "merge merge merge sort")}

    def test_doc_missing_any_term_is_absent(self, built):
        # 'walk' only in doc 1, 'alone' only in doc 4 — no doc has both
        assert run(built, ["walk alone"]) == set()

    def test_mismatched_corpus_raises_clearly(self, built):
        # pairing the index with a DIFFERENT corpus (same ids, other
        # texts) must raise the sidecar-mismatch diagnostic, not a
        # numpy shape error
        import ray.data as rd
        from mircv_ray.query.snippets import snippet_extract
        out, _ = built
        wrong = pa.table({
            "repo": ["r"] * len(DOCS),
            "path": [f"f{i}" for i in range(len(DOCS))],
            "content": ["tiny doc"] * len(DOCS),
        })
        with pytest.raises(Exception, match="does not match"):
            snippet_extract(out, rd.from_arrow(wrong),
                            ["binary search"], ctx=CTX).take_all()

    def test_tombstoned_docs_drop(self, built):
        out, corpus = built
        from mircv_ray.build.tombstones import delete_docs
        import shutil
        from pathlib import Path
        tmp = str(Path(out).parent / "idx_tomb")
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.copytree(out, tmp)
        delete_docs(tmp, [2])
        from mircv_ray.query.snippets import snippet_extract
        t = snippet_extract(tmp, corpus, ["binary search"],
                            ctx=CTX).take_all()
        docs = {r["doc_id"] for r in t}
        assert 2 not in docs and 1 in docs
