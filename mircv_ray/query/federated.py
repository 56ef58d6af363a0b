"""Federated (scatter-gather) search over MULTIPLE indexes — the
production serving pattern at 10^12-file scale, where the corpus lives
as many per-partition indexes (per time slice / language / tenant)
built and maintained independently: fan a query out to every
sub-index, score each one's candidates with GLOBAL collection
statistics, and merge the per-index top-k into one ranking.

The correctness bar is exact: with global stats (N, total length, per-
term df summed across sub-indexes), a federated query over a
PARTITIONED corpus returns bit-for-bit the ranking a single monolithic
index over the union would return (driver entry `federated_bm25` pins
exactly that against the monolithic SQL oracle; pytest pins it against
the engine). Local scoring would NOT match — idf and avgdl shift with
the partition — which is why each sub-index scores with the globally
aggregated constants.

Scale shape: phase 1 gathers per-index (n_docs, total_len, per-term
df) — lexicon lookups, metadata-sized; phase 2 fans one Ray task per
sub-index (in production: one RPC per shard server) that walks only
its own posting lists and returns at most k candidates per query;
the driver merges (indexes x k) rows. Nothing corpus-sized moves.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_PATH_ID_RE = r"doc_\d{8}\.txt$"
_GID_CACHE: dict = {}


def corpus_global_ids(index_dir: str) -> np.ndarray:
    """local docno (0-based) -> GLOBAL doc id for indexes built over
    `documents_as_corpus` subsets (the path carries the original
    doc_id: doc_%08d.txt). Reads only the docs table's path column;
    fully vectorized (one regex-validate + one slice-cast over the
    Arrow column — never a per-row Python loop) and memoized per
    worker process: the mapping is query-invariant."""
    cached = _GID_CACHE.get(index_dir)
    if cached is not None:
        return cached
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    t = pq.read_table(f"{index_dir}/docs", columns=["doc_id", "path"])
    paths = t["path"].combine_chunks() if isinstance(
        t["path"], pa.ChunkedArray) else t["path"]
    ok = pc.match_substring_regex(paths, _PATH_ID_RE)
    if t.num_rows and not pc.all(ok).as_py():
        bad = paths.filter(pc.invert(ok))[0].as_py()
        raise ValueError(f"path {bad!r} does not carry a global doc "
                         "id (doc_%08d.txt)")
    gids = pc.cast(pc.utf8_slice_codeunits(paths, 4, 12),
                   pa.int64()).to_numpy(zero_copy_only=False)
    # out[docno] = gid of the doc ranked docno-th by engine docId
    out = gids[np.argsort(t["doc_id"].to_numpy(), kind="stable")]
    while len(_GID_CACHE) > 8:
        _GID_CACHE.pop(next(iter(_GID_CACHE)))
    _GID_CACHE[index_dir] = out
    return out


def _index_stats(index_dir: str, terms: list[str]):
    from ..build import load_stats
    from .engine import _load_lexicon
    st = load_stats(index_dir)
    lex = _load_lexicon(index_dir)
    df = {t: (lex.get(t) or (0,))[0] for t in set(terms)}
    return (int(st["n_docs"]), int(st["total_doc_len"]),
            float(st["k1"]), float(st["b"]), st["parse"], st["squeeze"],
            df)


def federated_topk(index_dirs: list[str],
                   term_queries: list[list[str]], k: int = 10,
                   global_ids=corpus_global_ids) -> pa.Table:
    """BM25 top-k over the UNION of ``index_dirs`` with global
    statistics; returns (qid, doc_id, score) with doc_id = the global
    id from ``global_ids(index_dir)`` (default: the corpus path
    convention). Ties break (score desc, global doc_id asc).
    Duplicate query terms score per occurrence, unknown terms are
    ignored — the engine's conventions."""
    import ray

    if not index_dirs:
        raise ValueError("index_dirs must be non-empty")
    if k <= 0:
        raise ValueError("k must be positive")
    all_terms = [t for q in term_queries for t in q]
    stats = [_index_stats(d, all_terms) for d in index_dirs]
    if len({(s[2], s[3], s[4], s[5]) for s in stats}) != 1:
        raise ValueError("sub-indexes disagree on k1/b/tokenizer knobs")
    n_g = sum(s[0] for s in stats)
    total_g = sum(s[1] for s in stats)
    k1, b = stats[0][2], stats[0][3]
    avgdl_g = total_g / max(n_g, 1)
    df_g = {t: sum(s[6].get(t, 0) for s in stats)
            for t in {t for q in term_queries for t in q}}

    @ray.remote
    def scatter(index_dir: str) -> list:
        """Per-query (global_id, score) candidates from ONE sub-index,
        scored with the global constants; at most k rows per query."""
        from .engine import IndexReader
        r = IndexReader(index_dir)
        gids = global_ids(index_dir)
        out = []
        for terms in term_queries:
            lists = []
            for t in terms:                    # multiplicity kept
                dfg = df_g.get(t, 0)
                if dfg <= 0 or r.lexicon_entry(t) is None:
                    continue
                ids, tfs = r.decoded(t)
                idf = np.log10(n_g / dfg)
                dl = np.asarray(r.doc_len[ids - 1], dtype=np.float64)
                bj = 0.3 + b * (dl / avgdl_g)
                lists.append((ids, (tfs / (k1 * bj + tfs)) * idf))
            if not lists:
                out.append((np.zeros(0, np.int64),
                            np.zeros(0, np.float64)))
                continue
            cand = np.unique(np.concatenate([i for i, _ in lists]))
            acc = np.zeros(len(cand))
            for ids, contrib in lists:
                acc[np.searchsorted(cand, ids)] += contrib
            if len(r.tombstones):
                keep = r.alive_mask(cand)
                cand, acc = cand[keep], acc[keep]
            g = gids[cand - 1]
            if len(cand) > k:                  # local pre-top-k: the
                kth = -np.partition(-acc, k - 1)[k - 1]
                keep = acc >= kth              # global top-k is a
                g, acc = g[keep], acc[keep]    # subset of local top-ks
            order = np.lexsort((g, -acc))[:k]
            out.append((g[order], acc[order]))
        return out

    per_index = ray.get([scatter.remote(d) for d in index_dirs])
    qids, dids, scores = [], [], []
    for qi in range(len(term_queries)):
        g = np.concatenate([p[qi][0] for p in per_index])
        s = np.concatenate([p[qi][1] for p in per_index])
        order = np.lexsort((g, -s))[:k]
        qids += [qi] * len(order)
        dids += g[order].tolist()
        scores += s[order].tolist()
    return pa.table({
        "qid": pa.array(qids, type=pa.int64()),
        "doc_id": pa.array(dids, type=pa.int64()),
        "score": pa.array(scores, type=pa.float64()),
    })
