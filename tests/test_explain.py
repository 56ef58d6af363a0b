"""Score explanation (query/explain.py): per-term contributions sum
bit-exactly to the engine's score; rows match a brute-force oracle."""

import numpy as np
import pyarrow as pa
import pytest

from mircv_ray.config import IndexConfig, QueryConfig
from mircv_ray.sources import generate_corpus_table


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    import ray.data as rd
    from mircv_ray.build import build_index
    out = str(tmp_path_factory.mktemp("explain") / "idx")
    build_index(rd.from_arrow(
        generate_corpus_table(80, seed=3).drop_columns(["sha256"])),
        out, IndexConfig(parse=True, num_shards=4, salt_buckets=2))
    return out


QUERIES = [["def", "return", "value"], ["hash", "map", "def", "def"],
           ["zzz_unknown", "posting"]]


@pytest.mark.parametrize("standard", ["BM25", "TFIDF"])
def test_contributions_sum_to_engine_score(ray_session, idx, standard):
    from mircv_ray.query import QueryEngine
    from mircv_ray.query.explain import explain_scores
    eng = QueryEngine(idx, QueryConfig(standard=standard, k=3))
    for terms in QUERIES:
        top = eng.score_terms(list(terms))
        if not top:
            continue
        docid, score = top[0]
        t = explain_scores(idx, [terms], [docid], standard=standard)
        assert set(t["doc_id"].to_pylist()) <= {docid - 1}
        # duplicate terms contribute once per OCCURRENCE in the score,
        # once per distinct term in the breakdown
        mult = {x: terms.count(x) for x in terms}
        total = sum(c * mult[tm] for tm, c in
                    zip(t["term"].to_pylist(),
                        t["contribution"].to_pylist()))
        assert total == pytest.approx(score, abs=1e-12)


def test_rows_match_reader_brute_force(ray_session, idx):
    from mircv_ray.query.engine import IndexReader
    from mircv_ray.query.explain import explain_scores
    r = IndexReader(idx)
    terms = ["def", "return", "nonexistent_term_xyz"]
    docid = 5
    t = explain_scores(idx, [terms], [docid])
    got = {row["term"]: row for row in t.to_pylist()}
    for term in ("def", "return"):
        lex = r.lexicon_entry(term)
        ids, tfs = r.decoded(term)
        pos = int(np.searchsorted(ids, docid))
        present = pos < len(ids) and int(ids[pos]) == docid
        assert (term in got) == present
        if present:
            assert got[term]["tf"] == int(tfs[pos])
            assert got[term]["df"] == lex[0]
    assert "nonexistent_term_xyz" not in got


def test_validation(ray_session, idx):
    from mircv_ray.query.explain import explain_scores
    with pytest.raises(ValueError, match="standard"):
        explain_scores(idx, [["a"]], [1], standard="QLD")
    with pytest.raises(ValueError, match="lengths"):
        explain_scores(idx, [["a"]], [1, 2])
