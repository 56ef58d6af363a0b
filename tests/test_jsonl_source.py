"""JSONL corpus source: parity with the TSV reader and field mapping."""
import json

import pytest


def _build(corpus, out, tmp_path):
    from mircv_ray.build import build_index
    from mircv_ray.config import IndexConfig
    return build_index(corpus, out,
                       IndexConfig(parse=False, squeeze=False,
                                   num_shards=2, salt_buckets=1))


def test_jsonl_equals_tsv_index(ray_session, tmp_path):
    """Identical content through the JSONL and TSV readers builds an
    identical index (lexicon + decoded postings + query results)."""
    from mircv_ray.config import QueryConfig
    from mircv_ray.query import QueryEngine
    from mircv_ray.sources import collection_tsv_as_corpus, jsonl_as_corpus
    from tests.test_index_e2e import IndexReader, _decode_term_postings

    rows = [(0, "hash join table scan"), (1, "merge sort run"),
            (2, "   "),                      # blank -> dropped
            (3, "hash table probe build"), (4, "window stream state")]
    tsv = tmp_path / "collection.tsv"
    tsv.write_text("".join(f"{pid}\t{txt}\n" for pid, txt in rows))
    jl = tmp_path / "collection.jsonl"
    jl.write_text("".join(
        json.dumps({"id": str(pid), "text": txt}) + "\n"
        for pid, txt in rows))

    results, readers = [], []
    for src, reader in ((tsv, collection_tsv_as_corpus),
                        (jl, jsonl_as_corpus)):
        out = str(tmp_path / ("idx_" + src.suffix.lstrip(".")))
        stats = _build(reader(str(src)), out, tmp_path)
        assert stats["n_docs"] == 4
        eng = QueryEngine(out, QueryConfig(standard="BM25", k=5,
                                           parse=False, squeeze=False))
        results.append(eng.query("hash table"))
        readers.append(IndexReader(out))
    assert results[0] == results[1]
    a, b = readers
    assert a._lex == b._lex
    for term in a._lex:
        ia, ta = _decode_term_postings(a, term)
        ib, tb = _decode_term_postings(b, term)
        assert ia.tolist() == ib.tolist()
        assert ta.tolist() == tb.tolist()


def test_jsonl_field_mapping_and_lang(ray_session, tmp_path):
    from mircv_ray.sources import jsonl_as_corpus

    jl = tmp_path / "c.jsonl"
    jl.write_text("".join(json.dumps(r) + "\n" for r in [
        {"docno": "7", "body": "alpha beta", "language": "en"},
        {"docno": "x9", "body": "gamma", "language": None},
        {"docno": "8", "body": "  "},               # blank -> dropped
    ]))
    t = jsonl_as_corpus(str(jl), id_field="docno", text_field="body",
                        lang_field="language", lang="xx").to_pandas()
    t = t.sort_values("path").reset_index(drop=True)
    assert t.path.tolist() == ["000000000007", "x9"]  # numeric pad only
    assert t.lang.tolist() == ["en", "xx"]            # null -> default
    assert t.content.tolist() == ["alpha beta", "gamma"]


def test_jsonl_missing_field_raises(ray_session, tmp_path):
    from mircv_ray.sources import jsonl_as_corpus

    jl = tmp_path / "c.jsonl"
    jl.write_text(json.dumps({"id": "1", "body": "a"}) + "\n")
    with pytest.raises(Exception, match="text"):
        jsonl_as_corpus(str(jl)).to_pandas()
