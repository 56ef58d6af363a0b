"""Relevance evaluation: MAP@k / NDCG@k from a TREC run file + qrels.

The reference publishes MAP@20 / NDCG@20 on TREC-DL-2020 (PDF Table 3.3;
qrels at ``/root/reference/evaluation/qrels.txt``, 11 385 judgments) but
ships no scorer — this module closes that gap with the standard
``trec_eval`` definitions:

- ranking: trec_eval ignores the run file's rank column and re-sorts by
  score descending, ties broken by docno descending (string compare).
- MAP@k (``map_cut_k``): AP truncated at k, divided by R = the TOTAL
  number of relevant documents for the query (not min(R, k)); relevance
  is binarized at ``rel >= map_rel_threshold`` (TREC-DL passage uses
  ``-l 2``, i.e. threshold 2, since rel=1 passages are "related" but not
  relevant; plain trec_eval default is 1).
- NDCG@k (``ndcg_cut_k``): linear gain ``rel_i / log2(i + 1)`` (the
  trec_eval formulation used by the TREC-DL overview papers), ideal DCG
  from the query's qrels sorted by decreasing relevance, truncated at k.

Queries present in the qrels but absent from the run score 0 and count
in the mean (trec_eval ``-c`` behavior, the TREC-DL convention); run
queries with no qrels entry are skipped.

Pure driver-side code: runs and qrels are a few thousand lines — there
is nothing to distribute.
"""

from __future__ import annotations

import math
from collections import defaultdict
from pathlib import Path

__all__ = ["load_qrels", "load_run", "average_precision_at_k",
           "ndcg_at_k", "evaluate_run"]


def load_qrels(path: str | Path) -> dict[str, dict[str, int]]:
    """TREC qrels (``qid iter docno rel``) -> {qid: {docno: rel}}."""
    out: dict[str, dict[str, int]] = defaultdict(dict)
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 4:
                continue
            qid, _it, docno, rel = parts[0], parts[1], parts[2], parts[3]
            out[qid][docno] = int(rel)
    return dict(out)


def load_run(path: str | Path) -> dict[str, list[str]]:
    """TREC run file (``qid Q0 docno rank score tag``) -> {qid: [docno]}
    ranked by (score desc, docno desc) — trec_eval's ordering, which
    ignores the file's own rank column."""
    rows: dict[str, list[tuple[float, str]]] = defaultdict(list)
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 6:
                continue
            qid, docno, score = parts[0], parts[2], float(parts[4])
            rows[qid].append((score, docno))
    return {qid: [d for _s, d in sorted(lst, reverse=True)]
            for qid, lst in rows.items()}


def compare_runs(run_path: str | Path, golden_path: str | Path,
                 k: int = 20, score_rtol: float = 1e-6) -> dict:
    """Rank + score identity of a TREC run against a GOLDEN run (the
    reference's qres_* files): per shared qid, the top-k docno sequences
    (by the files' own rank column) must match exactly and the paired
    scores must agree within ``score_rtol`` relative error. Returns a
    report dict; ``ok`` is the gate the parity pytest asserts."""
    def load(p):
        d: dict[str, list] = defaultdict(list)
        with open(p) as f:
            for line in f:
                parts = line.split()
                if len(parts) < 6:
                    continue
                d[parts[0]].append((int(parts[3]), parts[2],
                                    float(parts[4])))
        return {q: sorted(v)[:k] for q, v in d.items()}

    a, b = load(run_path), load(golden_path)
    shared = sorted(set(a) & set(b))
    rank_mismatch, score_mismatch = [], []
    max_rel = 0.0
    for q in shared:
        if [x[1] for x in a[q]] != [x[1] for x in b[q]]:
            rank_mismatch.append(q)
            continue
        for (_, _, sa), (_, _, sb) in zip(a[q], b[q]):
            rel = abs(sa - sb) / max(abs(sb), 1e-12)
            max_rel = max(max_rel, rel)
            if rel > score_rtol and q not in score_mismatch:
                score_mismatch.append(q)
    return {
        "num_shared_queries": len(shared),
        "only_in_run": sorted(set(a) - set(b)),
        "only_in_golden": sorted(set(b) - set(a)),
        "rank_mismatch_qids": rank_mismatch,
        "score_mismatch_qids": score_mismatch,
        "max_score_rel_diff": max_rel,
        "k": k, "score_rtol": score_rtol,
        "ok": (len(shared) > 0 and not rank_mismatch
               and not score_mismatch),
    }


def average_precision_at_k(ranked: list[str], rels: dict[str, int],
                           k: int = 20, rel_threshold: int = 1) -> float:
    """AP@k with trec_eval ``map_cut_k`` semantics: binarized relevance,
    normalized by the query's TOTAL relevant count."""
    total_rel = sum(1 for r in rels.values() if r >= rel_threshold)
    if total_rel == 0:
        return 0.0
    hits = 0
    score = 0.0
    for i, docno in enumerate(ranked[:k], start=1):
        if rels.get(docno, 0) >= rel_threshold:
            hits += 1
            score += hits / i
    return score / total_rel


def ndcg_at_k(ranked: list[str], rels: dict[str, int], k: int = 20) -> float:
    """NDCG@k with trec_eval ``ndcg_cut_k`` semantics (linear gain)."""
    dcg = sum(rels.get(docno, 0) / math.log2(i + 1)
              for i, docno in enumerate(ranked[:k], start=1))
    ideal = sorted(rels.values(), reverse=True)[:k]
    idcg = sum(r / math.log2(i + 1) for i, r in enumerate(ideal, start=1))
    return dcg / idcg if idcg > 0 else 0.0


def evaluate_run(run_path: str | Path, qrels_path: str | Path,
                 k: int = 20, map_rel_threshold: int = 1) -> dict:
    """Mean MAP@k / NDCG@k over every qrels query (missing-from-run
    queries score 0, matching ``trec_eval -c``)."""
    qrels = load_qrels(qrels_path)
    run = load_run(run_path)
    if not qrels:
        raise ValueError(f"no judgments parsed from {qrels_path}")
    ap, nd = [], []
    for qid, rels in qrels.items():
        ranked = run.get(qid, [])
        ap.append(average_precision_at_k(ranked, rels, k,
                                         map_rel_threshold))
        nd.append(ndcg_at_k(ranked, rels, k))
    n = len(ap)
    return {
        "map_cut": sum(ap) / n,
        "ndcg_cut": sum(nd) / n,
        "k": k,
        "num_queries": n,
        "num_run_queries": len(run),
        "map_rel_threshold": map_rel_threshold,
    }
