"""Gopher n-gram repetition fractions (Rae et al. 2021 §A1.1 rules
5-8): per document,

- ``top_{n}gram_char_frac`` for n in (2, 3, 4): the largest value of
  occurrence_count(g) * token_chars(g) over the doc's n-grams g,
  divided by the doc's total token characters — the character mass the
  single worst repeated n-gram accounts for (a count-1 gram still
  contributes its own chars once, matching Gopher's "most frequent
  n-gram" reading deterministically: max of the product, no tie-break
  needed).
- ``dup_{n}gram_char_frac`` for n in (5..10): the token characters
  covered by the UNION of all non-first occurrences of any duplicated
  n-gram, divided by total token characters (overlapping windows count
  each token position once — the DataTrove/Gopher coverage semantics).

Tokens are the shared lowercased alnum stream (``dedup._token_ids_flat``
with the 64-bit hash, so a token-hash collision that would perturb the
SQL-oracle equality is out at 2^-64); "chars" are token BYTES, excluding
separators, on both sides of the oracle.

Map-only and fully vectorized: per n, ONE polynomial window hash over
the flat token stream, ONE stable lexsort to group (doc, gram) runs in
position order, run-length products for the top fraction, and a
difference-array cumsum for the duplicate coverage mask. No shuffle;
fractions round 4 half-away-from-zero (SQL round()).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)

# distinct odd 64-bit multipliers per window position (splitmix64 of
# the position index) so equal grams hash equal and position matters
_POLY_M = np.uint64(0x9E3779B97F4A7C15)


def _window_hashes(base: np.ndarray, parent: np.ndarray, n: int):
    """Polynomial hash of every length-n window of ``base`` that does
    not cross a document boundary. Returns (hashes, window start flat
    positions, window parent doc)."""
    total = len(base)
    if total < n:
        e = np.zeros(0, dtype=np.int64)
        return np.zeros(0, dtype=np.uint64), e, e
    m = total - n + 1
    h = np.zeros(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            h = h * _POLY_M + base[j:m + j]
    valid = parent[:m] == parent[n - 1:]
    starts = np.flatnonzero(valid).astype(np.int64)
    return h[valid], starts, parent[starts]


def _r4(x: np.ndarray) -> np.ndarray:
    return np.trunc(x * 1e4 + np.copysign(0.5, x)) / 1e4


def ngram_repetition_stats(batch: pa.Table, id_col: str = "doc_id",
                           text_col: str = "text",
                           top_ns=TOP_NS, dup_ns=DUP_NS) -> pa.Table:
    from .dedup import _token_ids_flat
    base, counts, lens = _token_ids_flat(batch, text_col, hash64=True,
                                         return_lens=True)
    n_docs = batch.num_rows
    parent = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    tot_chars = np.bincount(parent, weights=lens, minlength=n_docs) \
        if len(parent) else np.zeros(n_docs)
    # sliding char sums: chars of window starting at i = cl[i+n] - cl[i]
    cl = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    denom = np.maximum(tot_chars, 1.0)

    out = {id_col: batch[id_col],
           "n_token_chars": pa.array(tot_chars.astype(np.int64),
                                     type=pa.int64())}

    for n in top_ns:
        h, gs, gp = _window_hashes(base, parent, n)
        top = np.zeros(n_docs)
        if len(h):
            # stable sort by (doc, gram) keeps position order in runs
            order = np.lexsort((h, gp))
            hv, pv = h[order], gp[order]
            newrun = np.ones(len(hv), dtype=bool)
            newrun[1:] = (hv[1:] != hv[:-1]) | (pv[1:] != pv[:-1])
            rs = np.flatnonzero(newrun)
            run_len = np.diff(np.append(rs, len(hv)))
            first_gs = gs[order][rs]
            run_chars = cl[first_gs + n] - cl[first_gs]
            prod = run_len * run_chars
            run_parent = pv[rs]
            ps = np.flatnonzero(
                np.append(True, run_parent[1:] != run_parent[:-1]))
            top[run_parent[ps]] = np.maximum.reduceat(prod, ps)
        out[f"top_{n}gram_char_frac"] = pa.array(
            _r4(top / denom), type=pa.float64())

    for n in dup_ns:
        h, gs, gp = _window_hashes(base, parent, n)
        dupc = np.zeros(n_docs)
        if len(h):
            order = np.lexsort((h, gp))
            hv, pv = h[order], gp[order]
            first = np.ones(len(hv), dtype=bool)
            first[1:] = (hv[1:] != hv[:-1]) | (pv[1:] != pv[:-1])
            dup_gs = gs[order][~first]
            if len(dup_gs):
                d = np.zeros(len(base) + 1, dtype=np.int64)
                np.add.at(d, dup_gs, 1)
                np.add.at(d, dup_gs + n, -1)
                cov = np.cumsum(d[:-1]) > 0
                dupc = np.bincount(parent[cov], weights=lens[cov],
                                   minlength=n_docs)
        out[f"dup_{n}gram_char_frac"] = pa.array(
            _r4(dupc / denom), type=pa.float64())
    return pa.table(out)
