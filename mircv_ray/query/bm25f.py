"""BM25F — field-weighted BM25 ranking over multiple per-field indexes.

Robertson, Zaragoza & Taylor, CIKM'04 ("Simple BM25 extension to
multiple weighted fields"), the simplified per-field-normalization
form: a document is a set of FIELDS (body, title, path, anchors ...),
each with its own length normalization and weight, combined BEFORE
saturation so a term hit in two fields saturates once:

    tfx_{t,d} = sum_f  w_f * tf_{t,f,d} / B_{f,d}
    B_{f,d}   = (1 - b_f) + b_f * (len_f(d) / avgdl_f)
    score     = sum_t  tfx / (k1 + tfx) * log10(N / df_t)

with df_t = |{d : t appears in ANY field of d}| and N the body-field
document count — the natural lift of the reference's BM25
(Scorer.java:26-43, which has exactly one field) to fielded documents.

Ray-Data-first shape: each field is a STANDARD index built by the
normal pipeline over that field's corpus view (body = content, title =
a content slice, path = the file path...) — no new build machinery, no
fat unified index; fields stay independently buildable, mergeable and
vacuumable. Query time combines the fields' decoded posting lists in
candidate-set-sized NumPy (union by the docs-table PATH key, which is
stable across per-field blank-doc drops — a doc whose title tokenizes
empty simply never contributes title tf), so memory is bounded by the
query's posting lists exactly like the TAAT/QLD paths.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow.parquet as pq

from .engine import IndexReader


class _Field:
    """One field's read state: reader + engine-docId -> path key map."""

    def __init__(self, index_dir: str, weight: float, b: float):
        if weight < 0 or not (0.0 <= b <= 1.0):
            raise ValueError("field weight must be >= 0 and 0 <= b <= 1")
        self.reader = IndexReader(index_dir)
        dt = pq.read_table(str(Path(index_dir) / "docs"),
                           columns=["doc_id", "path"])
        paths = np.empty(self.reader.n_docs, dtype=object)
        paths[dt["doc_id"].to_numpy() - 1] = np.asarray(
            dt["path"].to_pylist(), dtype=object)
        self.path_of = paths
        self.weight = float(weight)
        self.b = float(b)


def bm25f_topk(field_specs: list[tuple[str, float, float]],
               term_queries: list[tuple[int, list[str]]],
               k1: float = 1.5, k: int = 10) -> list[tuple[int, str, float]]:
    """Rank with BM25F over per-field indexes.

    ``field_specs``: [(index_dir, weight, b), ...] — the FIRST entry is
    the body field and defines N (the collection document count).
    ``term_queries``: [(qid, [terms...])] — duplicate query terms score
    twice (the engine's convention). Returns (qid, path, score) rows,
    top-``k`` per query by (score desc, path asc).
    """
    if not field_specs:
        raise ValueError("need at least one field")
    fields = [_Field(*s) for s in field_specs]
    n_docs = fields[0].reader.n_docs
    out: list[tuple[int, str, float]] = []
    for qid, terms in term_queries:
        for f in fields:
            f.reader.prefetch(list(dict.fromkeys(terms)))
        per_term: list[tuple[np.ndarray, np.ndarray]] = []
        for t in terms:
            parts: list[tuple[np.ndarray, np.ndarray]] = []
            for f in fields:
                if f.reader.lexicon_entry(t) is None:
                    continue
                ids, tfs = f.reader.decoded(t)
                if len(f.reader.tombstones):
                    m = f.reader.alive_mask(ids)
                    ids, tfs = ids[m], tfs[m]
                if not len(ids):
                    continue
                dl = np.asarray(f.reader.doc_len[ids - 1],
                                dtype=np.float64)
                bfd = (1.0 - f.b) + f.b * (dl / f.reader.avg_doc_len)
                parts.append((f.path_of[ids - 1],
                              f.weight * tfs.astype(np.float64) / bfd))
            if not parts:
                continue
            cand = np.unique(np.concatenate([p for p, _ in parts]))
            tfx = np.zeros(len(cand), dtype=np.float64)
            for p, c in parts:
                np.add.at(tfx, np.searchsorted(cand, p), c)
            idf = np.log10(n_docs / len(cand))
            per_term.append((cand, tfx / (k1 + tfx) * idf))
        if not per_term:
            continue
        cand = np.unique(np.concatenate([c for c, _ in per_term]))
        acc = np.zeros(len(cand), dtype=np.float64)
        for c, s in per_term:
            np.add.at(acc, np.searchsorted(cand, c), s)
        if len(cand) > k:
            kth = -np.partition(-acc, k - 1)[k - 1]
            keep = acc >= kth
            cand, acc = cand[keep], acc[keep]
        # post-prune set is <= k + boundary ties: tiny, sort directly
        order = sorted(range(len(cand)),
                       key=lambda i: (-acc[i], cand[i]))[:k]
        out.extend((qid, str(cand[i]), float(acc[i])) for i in order)
    return out
