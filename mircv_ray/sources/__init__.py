"""Corpus sources: testdata adapters and the deterministic F1 generator."""

from .corpus import (
    CORPUS_COLUMNS,
    collection_tsv_as_corpus,
    documents_as_corpus,
    jsonl_as_corpus,
    warc_as_corpus,
    warc_record_bytes,
    documents_as_corpus_table,
    generate_corpus_table,
    write_corpus,
)

__all__ = [
    "CORPUS_COLUMNS",
    "collection_tsv_as_corpus",
    "documents_as_corpus",
    "jsonl_as_corpus",
    "warc_as_corpus",
    "warc_record_bytes",
    "documents_as_corpus_table",
    "generate_corpus_table",
    "write_corpus",
]
