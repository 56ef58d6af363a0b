"""mircv_ray — a Ray-Data-native inverted-index build + BM25 query engine.

A from-scratch rebuild of the data-processing capabilities of the
DavideBruni/MIRCV_project reference (a single-JVM SPIMI search engine),
re-expressed as Ray Data pipelines: streaming ``map_batches`` tokenization
over zero-copy Arrow batches, a ``groupby("term")`` shuffle producing
sorted, block-structured, compressed posting lists, and actor-pool query
scoring with MaxScore dynamic pruning.

Layout:
  codecs/   bit-level compression kernels (unary, vbyte-gap, Elias-Fano)
  text/     tokenizer (reference-parity), Porter stemmer, stopwords
  build/    index build pipeline (docid assignment, shuffle, lexicon)
  query/    posting cursors, MaxScore scorer, query engine actor
  oracle/   pure-Python single-process reference-semantics oracle (tests)
  ops/      training-data ops: dedup, similarity search, text analysis,
            multimodal stubs
  sources/  corpus adapters (documents table -> corpus schema)
"""

__version__ = "0.1.0"
