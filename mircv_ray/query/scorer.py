"""MaxScore dynamic pruning — faithful to the reference's semantics.

Re-implements the observable behavior of `Scorer.maxScore`
(search_engine/src/main/java/unipi/aide/mircv/queryProcessor/Scorer.java:85-162):

- posting lists must arrive sorted by term upper bound ASCENDING;
  ``upper_bounds`` are the prefix sums used for the essential/non-essential
  split (Scorer.java:89-94);
- the pivot advances while ``upper_bounds[pivot] <= theta``
  (Scorer.java:150-152) where theta is the top-k heap's minimum once full
  (Scorer.java:144-148);
- essential lists are scored at ``current``; non-essential lists are
  visited in descending index with the early break
  ``score + upper_bounds[i] <= theta`` (Scorer.java:128-131);
- conjunctive mode replicates the reference's ``-1``/``idToSkip`` dance
  (Scorer.java:109-126,135-137) INCLUDING its quirk that a document
  missing only from a NON-essential list keeps its partial score — this
  is deliberately not a "clean" AND (see SURVEY.md §7.4);
- top-k: bounded min-heap of size k; ties are broken deterministically by
  ascending docId (the reference's heap compares score only and leaves
  tie order unspecified, Scorer.java:205-208).

Score formulas (Q3/Q4, Scorer.java:26-43):
  BM25:  tf / (k1*Bj + tf) * idf,  Bj = 0.3 + 0.7*docLen/avgDocLen
         (k1=1.5 — NOT the textbook (k1+1) numerator)
  TFIDF: (1 + log10(tf)) * idf
"""

from __future__ import annotations

import heapq
import math

import numpy as np

from .cursors import EXHAUSTED, PostingCursor


def bm25_score(tf: int, doc_len: int, avg_doc_len: float, idf: float,
               k1: float = 1.5, b: float = 0.7, b_opp: float = 0.3) -> float:
    # b_opp is the literal 0.30 from Scorer.java:14 — NOT computed as 1-b,
    # so the float matches the reference bit-for-bit (1.0-0.7 != 0.3 in IEEE)
    bj = b_opp + b * (doc_len / avg_doc_len)
    return (tf / (k1 * bj + tf)) * idf


def tfidf_score(tf: int, idf: float) -> float:
    return (1.0 + math.log10(tf)) * idf


def max_score(cursors: list[PostingCursor], k: int, conjunctive: bool,
              score_fn, alive=None) -> list[tuple[int, float]]:
    """Run MaxScore over cursors (pre-sorted by term_ub ascending).

    ``score_fn(cursor) -> float`` scores the cursor's CURRENT posting.
    ``alive(doc_id) -> bool`` (optional) drops tombstoned docs: a dead
    doc skips non-essential scoring and never enters the heap, so it
    cannot raise theta — results for surviving docs are identical to a
    run without the dead doc's postings.
    Returns [(doc_id, score)] ranked by (score desc, doc_id asc), len <= k.
    """
    if not cursors:
        return []
    n = len(cursors)
    upper_bounds = np.cumsum([c.term_ub for c in cursors])
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap
    theta = 0.0
    pivot = 0
    id_to_skip = -1
    current = min(c.doc_id() for c in cursors)

    while pivot < n and current != EXHAUSTED:
        score = 0.0
        nxt = EXHAUSTED
        # ---- essential lists (Scorer.java:105-124)
        for i in range(pivot, n):
            if cursors[i].doc_id() == current:
                score += score_fn(cursors[i])
                cursors[i].next()
            elif conjunctive:
                if current != -1:
                    id_to_skip = current
                    current = -1
                    score = 0.0
                elif cursors[i].doc_id() == id_to_skip:
                    cursors[i].next()
            nxt = min(nxt, cursors[i].doc_id())
        if current > 0 and (alive is None or alive(current)):
            # ---- non-essential lists (Scorer.java:128-138)
            for i in range(pivot - 1, -1, -1):
                if score + upper_bounds[i] <= theta:
                    break
                # block-max refinement (beyond the reference): the block
                # that could contain `current` bounds list i tighter than
                # its term UB; with a STRICT <, a doc failing this check
                # can only push a score strictly below theta, which the
                # bounded heap immediately discards — so the final top-k
                # (including tie order) is provably unchanged.
                prefix = upper_bounds[i - 1] if i else 0.0
                if score + prefix + cursors[i].ub_at(current) < theta:
                    break
                cursors[i].next_geq(current)
                if cursors[i].doc_id() == current:
                    score += score_fn(cursors[i])
                elif conjunctive:
                    break
            # ---- bounded heap (Scorer.java:140-153)
            heapq.heappush(heap, (score, -current))
            if len(heap) > k:
                heapq.heappop(heap)
            if len(heap) == k:
                theta = heap[0][0]
            while pivot < n and upper_bounds[pivot] <= theta:
                pivot += 1
        current = nxt

    out = [(-neg, s) for s, neg in heap]
    out.sort(key=lambda t: (-t[1], t[0]))
    return out


def block_max_wand(cursors: list[PostingCursor], k: int, score_fn,
                   alive=None) -> list[tuple[int, float]]:
    """Block-Max WAND (Ding & Suel, SIGIR'11): WAND's pivot selection
    refined with the per-block score upper bounds the index already
    stores for block-max MaxScore. After the term-UB prefix sum picks a
    pivot, a SHALLOW check sums each pre-pivot cursor's CURRENT-block
    bound at the pivot docId (``ub_at`` — no block decode); if even that
    cannot beat theta, the whole window up to the smallest current block
    boundary is pruned in one jump. Lossless: block bounds are true
    bounds and are CONSTANT over [pivot_doc, min boundary], so every doc
    in the skipped window is individually prunable. Ranking is identical
    to :func:`wand` / :func:`max_score` / exhaustive TAAT. On an index
    without per-block cores ``ub_at`` falls back to the term UB, the
    shallow sum equals the pivot sum (> theta), and this degrades to
    exactly WAND.
    """
    if not cursors:
        return []
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap
    theta = 0.0
    live = [c for c in cursors if c.doc_id() != EXHAUSTED]
    while live:
        live.sort(key=lambda c: c.doc_id())
        acc = 0.0
        pivot = -1
        for i, c in enumerate(live):
            acc += c.term_ub
            if acc > theta:
                pivot = i
                break
        if pivot < 0:
            break
        pivot_doc = live[pivot].doc_id()
        # the shallow window must include EVERY cursor sitting at the
        # pivot doc — post-pivot cursors can tie its docId after the
        # sort, and their mass counts toward the doc's true bound
        upto = pivot
        while upto + 1 < len(live) and live[upto + 1].doc_id() == pivot_doc:
            upto += 1
        shallow = 0.0
        for c in live[:upto + 1]:
            shallow += c.ub_at(pivot_doc)
        if shallow <= theta:
            # pivot doc (and everything up to the first block boundary)
            # cannot enter the top-k: jump every window cursor to
            # d' = min current-block last-doc + 1, capped by the next
            # cursor's docId (beyond it other lists join in); block
            # bounds are constant over [pivot_doc, d'), so every doc in
            # the window is individually prunable
            nxt = pivot_doc + 1
            bound = None
            for c in live[:upto + 1]:
                bm = c.block_max
                bi = int(np.searchsorted(bm, pivot_doc))
                if bi < len(bm):
                    b = int(bm[bi])
                    bound = b if bound is None else min(bound, b)
            d_new = max(nxt, (bound + 1) if bound is not None else nxt)
            if upto + 1 < len(live):
                d_new = min(d_new, live[upto + 1].doc_id())
            d_new = max(d_new, nxt)
            for c in live[:upto + 1]:
                if c.doc_id() < d_new:
                    c.next_geq(d_new)
        elif live[0].doc_id() == pivot_doc:
            if alive is None or alive(pivot_doc):
                score = 0.0
                for c in cursors:
                    if c.doc_id() == pivot_doc:
                        score += score_fn(c)
                heapq.heappush(heap, (score, -pivot_doc))
                if len(heap) > k:
                    heapq.heappop(heap)
                if len(heap) == k:
                    theta = heap[0][0]
            for c in live:
                if c.doc_id() == pivot_doc:
                    c.next()
        else:
            adv = max((c for c in live[:pivot] if c.doc_id() < pivot_doc),
                      key=lambda c: c.term_ub)
            adv.next_geq(pivot_doc)
        live = [c for c in live if c.doc_id() != EXHAUSTED]
    out = [(-neg, s) for s, neg in heap]
    out.sort(key=lambda t: (-t[1], t[0]))
    return out


def wand(cursors: list[PostingCursor], k: int, score_fn,
         alive=None) -> list[tuple[int, float]]:
    """WAND disjunctive top-k (Broder et al., CIKM'03) — the classic
    document-at-a-time dynamic-pruning sibling of MaxScore. The
    reference implements only MaxScore (Scorer.java:85-162); WAND is
    this engine's extension, sharing the cursors, upper bounds and
    score formulas, and returning the IDENTICAL ranking (term upper
    bounds are true bounds, so the pruning is lossless; ties score
    desc, docId asc like :func:`max_score`).

    Loop: sort live cursors by current docId; the pivot is the first
    position where the running term-UB sum exceeds theta (heap min once
    full) — no document below the pivot's docId can enter the top-k.
    If the smallest current docId equals the pivot's, that document is
    fully scored; otherwise one pre-pivot cursor (largest term UB, so
    the sum shrinks fastest) jumps to the pivot docId via nextGEQ.
    """
    if not cursors:
        return []
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap
    theta = 0.0
    live = [c for c in cursors if c.doc_id() != EXHAUSTED]
    while live:
        live.sort(key=lambda c: c.doc_id())
        acc = 0.0
        pivot = -1
        for i, c in enumerate(live):
            acc += c.term_ub
            if acc > theta:
                pivot = i
                break
        if pivot < 0:
            break  # even all UBs together cannot beat theta
        pivot_doc = live[pivot].doc_id()
        if live[0].doc_id() == pivot_doc:
            if alive is None or alive(pivot_doc):
                # sum in the ORIGINAL cursor order (not the docId sort),
                # so float accumulation order is deterministic per query
                score = 0.0
                for c in cursors:
                    if c.doc_id() == pivot_doc:
                        score += score_fn(c)
                heapq.heappush(heap, (score, -pivot_doc))
                if len(heap) > k:
                    heapq.heappop(heap)
                if len(heap) == k:
                    theta = heap[0][0]
            for c in live:
                if c.doc_id() == pivot_doc:
                    c.next()
        else:
            # advance the largest-UB cursor strictly BELOW the pivot doc
            # (a pre-pivot cursor can TIE the pivot's docId after the
            # sort; nextGEQ would no-op on it and the loop would spin)
            adv = max((c for c in live[:pivot] if c.doc_id() < pivot_doc),
                      key=lambda c: c.term_ub)
            adv.next_geq(pivot_doc)
        live = [c for c in live if c.doc_id() != EXHAUSTED]
    out = [(-neg, s) for s, neg in heap]
    out.sort(key=lambda t: (-t[1], t[0]))
    return out
