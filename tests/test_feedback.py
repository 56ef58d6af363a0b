"""Pseudo-relevance-feedback tests: the two-pass operator vs an
independent pure-Python BM25 + expansion implementation on a small
corpus, plus edge cases (unknown-only query, df cap, no candidates)."""

import math

import numpy as np
import pyarrow as pa
import pytest

from mircv_ray.text.tokenizer import tokenize_text

DOCS = [
    "binary search tree walk",
    "the binary search loop uses binary search twice",
    "search binary is reversed here",
    "binary alone and search alone",
    "tail ends with binary",
    "search starts this one",
    "merge merge merge sort",
    "sort walk merge here tree",
    "loop uses twice reversed tail",
    "one alone ends with starts",
]

K_FB, M_EXP, DF_CAP, K = 3, 2, 2, 5


def corpus_stats():
    toks = [tokenize_text(d, parse=False, squeeze=False) for d in DOCS]
    n = len(toks)
    tf = [{} for _ in toks]
    for i, ts in enumerate(toks):
        for t in ts:
            tf[i][t] = tf[i].get(t, 0) + 1
    df = {}
    for d in tf:
        for t in d:
            df[t] = df.get(t, 0) + 1
    avgdl = sum(len(ts) for ts in toks) / n
    return toks, tf, df, n, avgdl


def bm25(term, doc, tf, df, n, avgdl, toks):
    if term not in df or term not in tf[doc]:
        return 0.0
    bj = 0.3 + 0.7 * (len(toks[doc]) / avgdl)
    f = tf[doc][term]
    return f / (1.5 * bj + f) * math.log10(n / df[term])


def score_pass(terms, tf, df, n, avgdl, toks, k):
    scores = {}
    for d in range(len(toks)):
        s = sum(bm25(t, d, tf, df, n, avgdl, toks) for t in terms)
        if any(t in tf[d] for t in terms):
            scores[d] = s
    order = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return order[:k]


def brute_prf(queries):
    toks, tf, df, n, avgdl = corpus_stats()
    out = []
    for qid, terms in enumerate(queries):
        fb = [d for d, _ in score_pass(terms, tf, df, n, avgdl,
                                       toks, K_FB)]
        w = {}
        for d in fb:
            for t, f in tf[d].items():
                if t in terms or df.get(t, 0) * DF_CAP > n:
                    continue
                w[t] = w.get(t, 0) + f
        exp = [t for t, _ in sorted(w.items(),
                                    key=lambda kv: (-kv[1], kv[0]))[:M_EXP]]
        for d, s in score_pass(list(terms) + exp, tf, df, n, avgdl,
                               toks, K):
            out.append((qid, d + 1, round(s, 9)))  # engine ids 1-based
    return sorted(out)


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data as rd
    from mircv_ray.build import build_index
    from mircv_ray.config import IndexConfig
    out = str(tmp_path_factory.mktemp("prf") / "idx")
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


def run(built, queries):
    from mircv_ray.query.feedback import bm25_prf
    out, corpus = built
    t, exp = bm25_prf(out, corpus, queries, k_fb=K_FB, m_exp=M_EXP,
                      df_cap=DF_CAP, k=K, parse=False, squeeze=False)
    rows = sorted((q, d, round(s, 9)) for q, d, s in
                  zip(t["qid"].to_pylist(), t["doc_id"].to_pylist(),
                      t["score"].to_pylist()))
    return rows, exp


class TestPRF:
    def test_matches_brute_force(self, built):
        queries = [["binary", "search"], ["merge", "merge", "sort"],
                   ["walk"], ["the", "a"], ["xyznope"]]
        got, exp = run(built, queries)
        assert got == brute_prf(queries)
        # expansion really fired for at least one query
        assert any(exp.get(q) for q in range(len(queries)))

    def test_unknown_only_query_is_empty(self, built):
        got, exp = run(built, [["xyznope", "qqqq"]])
        assert got == [] and exp.get(0, []) == []

    def test_df_cap_excludes_common_terms(self, built):
        toks, tf, df, n, _ = corpus_stats()
        _, exp = run(built, [["merge"]])
        for t in exp.get(0, []):
            assert df[t] * DF_CAP <= n

    def test_expansion_excludes_original_terms(self, built):
        _, exp = run(built, [["binary", "search"]])
        assert not ({"binary", "search"} & set(exp.get(0, [])))


def brute_mlt(doc_ids, m_terms=3, df_cap=2, k=5):
    toks, tf, df, n, avgdl = corpus_stats()
    out, terms_of = [], {}
    for qid, d in enumerate(doc_ids):
        cand = [(-f, t) for t, f in tf[d - 1].items()
                if df[t] * df_cap <= n]
        terms = [t for _, t in sorted(cand)[:m_terms]]
        terms_of[qid] = terms
        hits = [(dd, s) for dd, s in
                score_pass(terms, tf, df, n, avgdl, toks, k + 1)
                if dd != d - 1][:k]
        out += [(qid, dd + 1, round(s, 9)) for dd, s in hits]
    return sorted(out), terms_of


class TestMoreLikeThis:
    def test_matches_brute_force(self, built):
        from mircv_ray.query.feedback import more_like_this
        out, corpus = built
        srcs = [1, 7, 3]
        t, terms = more_like_this(out, corpus, srcs, m_terms=3,
                                  df_cap=2, k=5, parse=False,
                                  squeeze=False)
        got = sorted((q, d, round(s, 9)) for q, d, s in
                     zip(t["qid"].to_pylist(), t["doc_id"].to_pylist(),
                         t["score"].to_pylist()))
        want, want_terms = brute_mlt(srcs, m_terms=3, df_cap=2, k=5)
        assert {q: terms[q] for q in terms} == want_terms
        assert got == want

    def test_source_doc_never_in_results(self, built):
        from mircv_ray.query.feedback import more_like_this
        out, corpus = built
        t, _ = more_like_this(out, corpus, [2], m_terms=3, df_cap=2,
                              k=10, parse=False, squeeze=False)
        assert 2 not in t["doc_id"].to_pylist()
