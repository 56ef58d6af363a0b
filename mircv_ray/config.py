"""Engine configuration.

Mirrors the reference's compile-time knobs
(search_engine/src/main/java/unipi/aide/mircv/configuration/Configuration.java
and Lexicon.TERM_DIMENSION at model/Lexicon.java:22), plus the Ray-specific
scale knobs (shards, salt buckets, batch sizes) the reference has no
equivalent for.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class IndexConfig:
    # --- reference-equivalent knobs -------------------------------------
    parse: bool = True              # stopword removal + Porter stemming (IndexingMain.java:33)
    codec: str = "vbyte"            # "vbyte" (north-star primary) | "ef" | "none"
    block_threshold: int = 2048     # bytes (Configuration.java:15)
    term_dimension: int = 64        # max term bytes, exclusive (Lexicon.java:22)
    # BM25 parameters (Scorer.java:13-15) — NOT the textbook values
    k1: float = 1.5
    b: float = 0.7

    # --- Ray-scale knobs -------------------------------------------------
    num_shards: int = 16            # term-hash partitions of the postings/lexicon output
    salt_buckets: int = 1           # docId-range segments per term (>1 splits hot terms)
    tokenize_batch_size: int = 1024     # docs per tokenizer batch
    explode_batch_size: int = 8192      # docs per SPIMI-partial batch (bigger
                                        # batches consolidate partial lists)
    exchange: str = "groupby"           # postings exchange: "groupby"
                                        # (ds.groupby.map_groups — wins on a
                                        # single node) | "mr" (direct
                                        # map/reduce over object-store refs;
                                        # measured SLOWER here: 256x256 small
                                        # objects cost more than the sort,
                                        # kept as the explicit-exchange
                                        # reference implementation)
    group_batch_size: int = 4096        # (term[,seg]) groups per build batch
    mr2_tree_fanin: int = 0             # mr exchange two-level reduce merge
                                        # tree: when the map-task count
                                        # exceeds this fan-in, per-bucket
                                        # combine tasks merge map-slice
                                        # groups before the key reduces
                                        # (0 = MIRCV_MR2_TREE_FANIN env
                                        # default, 256)
    squeeze: bool = True            # run-of-3+ squeeze (Parser.java:63-90); the
                                    # "basic" SQL-checkable mode turns this off

    def codec_valid(self) -> None:
        if self.codec not in ("vbyte", "ef", "none"):
            raise ValueError(f"unknown codec {self.codec!r}")


@dataclass(frozen=True)
class QueryConfig:
    standard: str = "BM25"          # "BM25" | "TFIDF" (Configuration.java:4, default TFIDF there;
                                    # BM25 is this engine's headline standard)
                                    # | "QLD" (query-likelihood, Dirichlet
                                    # smoothing — this engine's extension)
    mu: float = 2000.0              # QLD Dirichlet smoothing parameter
                                    # (Zhai & Lafferty SIGIR'01 default)
    k: int = 10                     # top-k heap size (MINHEAP_DIMENSION)
    conjunctive: bool = False
    parse: bool = True              # must match the index build's parse flag
    squeeze: bool = True
    algo: str = "auto"              # "auto" (vectorized TAAT for disjunctive,
                                    # MaxScore for conjunctive) | "maxscore"
                                    # (always the faithful Scorer.java loop)
                                    # | "wand" (Broder CIKM'03 pruning,
                                    # disjunctive; this engine's extension)
                                    # | "bmw" (Block-Max WAND, Ding & Suel
                                    # SIGIR'11 — WAND + per-block bounds)
