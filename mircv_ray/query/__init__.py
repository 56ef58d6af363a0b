"""Query engine: posting cursors, MaxScore, scorer actors."""

from .cursors import EXHAUSTED, PostingCursor
from .scorer import block_max_wand, max_score, wand
from .engine import IndexReader, QueryEngine, QueryScorer, run_queries, write_trec
from .phrase import phrase_match, phrase_occurrence_counts
from .bm25f import bm25f_topk

__all__ = ["EXHAUSTED", "PostingCursor", "max_score", "IndexReader",
           "QueryEngine", "QueryScorer", "run_queries", "write_trec",
           "phrase_match", "phrase_occurrence_counts", "bm25f_topk"]
