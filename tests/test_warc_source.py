"""WARC corpus source: record parsing, gzip members, HTTP envelope
strip, record-type filtering, and index parity with the TSV reader."""
import gzip

import pytest


def _http_payload(body: bytes) -> bytes:
    return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body)


def _response_record(uri: str, body: bytes) -> bytes:
    from mircv_ray.sources import warc_record_bytes
    return warc_record_bytes({
        "WARC-Type": "response",
        "WARC-Record-ID": f"<urn:uuid:{uri}>",
        "WARC-Target-URI": uri,
        "Content-Type": "application/http; msgtype=response",
    }, _http_payload(body))


def _warcinfo_record() -> bytes:
    from mircv_ray.sources import warc_record_bytes
    return warc_record_bytes({
        "WARC-Type": "warcinfo",
        "WARC-Record-ID": "<urn:uuid:info>",
        "Content-Type": "application/warc-fields",
    }, b"software: test\r\n")


def test_warc_equals_tsv_index(ray_session, tmp_path):
    """Identical content through the WARC and TSV readers builds an
    identical index (lexicon + decoded postings + query results)."""
    from mircv_ray.config import IndexConfig, QueryConfig
    from mircv_ray.build import build_index
    from mircv_ray.query import QueryEngine
    from mircv_ray.sources import collection_tsv_as_corpus, warc_as_corpus
    from tests.test_index_e2e import IndexReader, _decode_term_postings

    rows = [(0, "hash join table scan"), (1, "merge sort run"),
            (2, "   "),                      # blank -> dropped
            (3, "hash table probe build"), (4, "window stream state")]
    tsv = tmp_path / "collection.tsv"
    tsv.write_text("".join(f"{pid}\t{txt}\n" for pid, txt in rows))
    warc = tmp_path / "crawl.warc"
    warc.write_bytes(
        _warcinfo_record()                    # non-document type: skipped
        + b"".join(_response_record(str(pid), txt.encode())
                   for pid, txt in rows))

    results, readers = [], []
    for corpus in (collection_tsv_as_corpus(str(tsv)),
                   warc_as_corpus(str(warc))):
        out = str(tmp_path / f"idx{len(results)}")
        stats = build_index(corpus, out,
                            IndexConfig(parse=False, squeeze=False,
                                        num_shards=2, salt_buckets=1))
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


def test_warc_gzip_members_and_types(ray_session, tmp_path):
    """Per-record gzip members decompress transparently; only document
    record types survive; resource records keep their raw payload."""
    from mircv_ray.sources import warc_as_corpus, warc_record_bytes

    resource = warc_record_bytes({
        "WARC-Type": "resource",
        "WARC-Record-ID": "<urn:uuid:r1>",
        "WARC-Target-URI": "file:///a.txt",
        "Content-Type": "text/plain",
    }, b"plain resource body")
    request = warc_record_bytes({
        "WARC-Type": "request",
        "WARC-Record-ID": "<urn:uuid:q1>",
        "Content-Type": "application/http; msgtype=request",
    }, b"GET / HTTP/1.1\r\n\r\n")
    response = _response_record("9", b"indexed body")
    gz = tmp_path / "crawl.warc.gz"
    # one gzip member per record, the Common-Crawl convention
    gz.write_bytes(b"".join(gzip.compress(r)
                            for r in (_warcinfo_record(), request,
                                      resource, response)))

    t = warc_as_corpus(str(gz)).to_pandas().sort_values("path")
    assert t.path.tolist() == ["000000000009", "file:///a.txt"]
    assert t.content.tolist() == ["indexed body", "plain resource body"]
    assert (t.lang == "html").all()


def test_warc_malformed_raises(ray_session, tmp_path):
    from mircv_ray.sources import warc_as_corpus

    bad = tmp_path / "bad.warc"
    bad.write_bytes(b"NOT-A-WARC/1.0\r\n\r\n")
    with pytest.raises(Exception, match="not a WARC record"):
        warc_as_corpus(str(bad)).to_pandas()

    trunc = tmp_path / "trunc.warc"
    trunc.write_bytes(b"WARC/1.0\r\nWARC-Type: response\r\n"
                      b"Content-Length: 999\r\n\r\nshort")
    with pytest.raises(Exception, match="overruns"):
        warc_as_corpus(str(trunc)).to_pandas()
