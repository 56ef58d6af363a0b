"""Substring-level duplicate detection: document pairs sharing a
fixed-length character window.

The substring-dedup primitive of "Deduplicating Training Data Makes
Language Models Better" (Lee et al., ACL 2022): two documents are
substring-duplicates when they share any length-``n`` character run.
Re-expressed Ray-Data-first as batch transforms + one hash exchange —
no suffix array is materialized; the equivalent detection comes from
bucketing window fingerprints.

Two paths share one kernel:

- **exact** (``winnow_w=None``): every length-``n`` byte window is a
  bucket row, keyed by the WINDOW BYTES (not a hash), so a bucket match
  IS a shared substring — zero false pairs, recall 1 for shared runs of
  length >= n. Shuffle volume is ~``n``x the text bytes: this is the
  oracle twin, run at validation scale.
- **winnowing** (``winnow_w=w``): the public fingerprint-selection
  algorithm of Schleimer/Wilkerson/Aiken (SIGMOD'03, the MOSS
  algorithm): over every run of ``w`` consecutive window hashes keep
  the minimum (ties -> leftmost). Guarantee: any shared substring of
  length >= ``n + w - 1`` selects the SAME window in both documents,
  so recall is 1 at that length; rows moved shrink ~``2/(w+1)``x.
  Selected grams still pair by bytes, so hash collisions cannot create
  false pairs — precision contract = "shares a selected n-gram".

Both emit distinct (a, b) id pairs with a < b. The production path at
100 TB is winnowing with n ~ 50, w ~ 100 (fingerprint density ~2%);
content bytes are read once and only (gram, id) rows shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import binary_values_parts, multi_arange
from .dedup import (_add_pkey, _distinct_pairs, _make_partition_pairs)

_B = np.uint64(1099511628211)          # FNV64 prime — odd, invertible mod 2^64
_BINV = np.uint64(pow(1099511628211, -1, 1 << 64))
_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


def _window_hashes(data: np.ndarray, starts: np.ndarray, n: int) -> np.ndarray:
    """Polynomial rolling hash (mod 2^64) of ``data[s:s+n]`` for every
    ``s`` in ``starts`` — O(len(data)) prefix passes, O(1) per window.

    hash(s) = sum_j data[s+j] * B^j  (mod 2^64), computed from global
    prefixes P[i] = sum_{t<i} data[t]*B^t as (P[s+n]-P[s]) * B^-s; the
    formula is position-independent, so windows never mix documents as
    long as ``starts`` only points at in-document offsets."""
    if len(starts) == 0:
        return np.zeros(0, dtype=np.uint64)
    L = len(data)
    with np.errstate(over="ignore"):
        pw = np.empty(L, dtype=np.uint64)
        pw[0] = 1
        inv_pw = np.empty(L, dtype=np.uint64)
        inv_pw[0] = 1
        if L > 1:
            np.multiply.accumulate(np.full(L - 1, _B, dtype=np.uint64),
                                   out=pw[1:])
            np.multiply.accumulate(np.full(L - 1, _BINV, dtype=np.uint64),
                                   out=inv_pw[1:])
        P = np.zeros(L + 1, dtype=np.uint64)
        np.cumsum(data.astype(np.uint64) * pw, out=P[1:])
        return (P[starts + n] - P[starts]) * inv_pw[starts]


def _winnow_select(h: np.ndarray, wins_per_doc: np.ndarray,
                   w: int) -> np.ndarray:
    """Winnowing selection over per-document contiguous hash runs:
    indices into ``h`` of each w-window minimum (leftmost on ties).

    Documents are separated by ``w-1`` MAX-value sentinels so no
    w-window mixes two documents' guarantee ranges; sentinel argmins
    (windows fully inside padding) are masked out afterwards."""
    total = len(h)
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    if w <= 1:
        return np.arange(total, dtype=np.int64)
    docs = len(wins_per_doc)
    pad = w - 1
    out_len = total + pad * docs
    padded = np.full(out_len, _SENTINEL, dtype=np.uint64)
    doc_off = np.cumsum(wins_per_doc) - wins_per_doc
    pos = multi_arange(wins_per_doc) + np.repeat(
        doc_off + pad * np.arange(docs, dtype=np.int64), wins_per_doc)
    padded[pos] = h
    arg = _sliding_argmin(padded, w)
    sel = np.unique(arg)
    real = np.zeros(out_len, dtype=bool)
    real[pos] = True
    sel = sel[real[sel]]
    back = np.full(out_len, -1, dtype=np.int64)
    back[pos] = np.arange(total, dtype=np.int64)
    return back[sel]


def _sliding_argmin(padded: np.ndarray, w: int) -> np.ndarray:
    """O(total) sliding-window argmin with the LEFTMOST-tie rule —
    block decomposition (the classic two-scan sparse-table-free
    sliding minimum): split into w-sized blocks, compute per-block
    prefix argmins (left->right, STRICT decrease keeps the earlier
    index on ties) and suffix argmins (right->left, <= prefers the
    leftmost original index), then every window [i, i+w) is the better
    of suffix[i] (its block's tail) and prefix[i+w-1] (the next
    block's head), ties to the left part. Replaces
    sliding_window_view(...).argmin(axis=1), whose re-scan made
    selection O(total*w) — ~w times the needed work at the
    production w~100 (round-5 review finding)."""
    out_len = len(padded)
    nb = -(-out_len // w)
    B = np.full((nb, w), _SENTINEL, dtype=np.uint64)
    B.ravel()[:out_len] = padded
    idx = np.arange(w, dtype=np.int64)
    # prefix argmin per block: new minimum only on strict decrease
    pv = np.minimum.accumulate(B, axis=1)
    strict = np.empty((nb, w), dtype=bool)
    strict[:, 0] = True
    strict[:, 1:] = B[:, 1:] < pv[:, :-1]
    prefix = np.maximum.accumulate(np.where(strict, idx, -1), axis=1)
    # suffix argmin per block via the reversed scan; <= prefers the
    # later reversed element == the leftmost original
    Br = B[:, ::-1]
    sv = np.minimum.accumulate(Br, axis=1)
    le = np.empty((nb, w), dtype=bool)
    le[:, 0] = True
    le[:, 1:] = Br[:, 1:] <= sv[:, :-1]
    suffix_r = np.maximum.accumulate(np.where(le, idx, -1), axis=1)
    base = (np.arange(nb, dtype=np.int64) * w)[:, None]
    prefix_g = (prefix + base).ravel()[:out_len]
    suffix_g = ((w - 1) - suffix_r[:, ::-1] + base).ravel()[:out_len]
    n_win = out_len - w + 1
    i = np.arange(n_win, dtype=np.int64)
    a = suffix_g[i]              # argmin of [i .. end of i's block]
    b = prefix_g[i + w - 1]      # argmin of [next block start .. i+w-1]
    return np.where(padded[a] <= padded[b], a, b)


def ngram_window_rows(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 30,
                      winnow_w: int | None = None) -> pa.Table:
    """One row per (selected) length-``n`` byte window of each document:
    (gram fixed_size_binary(n), ghash int64, id). Fully vectorized —
    one buffer view over the batch's text, one gather for the grams."""
    data, lens = binary_values_parts(batch[text_col])
    ids = batch[id_col].to_numpy()
    wins = np.maximum(lens - (n - 1), 0)
    doc_starts = np.cumsum(lens) - lens
    starts = np.repeat(doc_starts, wins) + multi_arange(wins)
    win_ids = np.repeat(ids, wins)
    hashes = _window_hashes(data, starts, n)
    if winnow_w is not None and winnow_w > 1:
        sel = _winnow_select(hashes, wins, winnow_w)
        starts, win_ids, hashes = starts[sel], win_ids[sel], hashes[sel]
    k = len(starts)
    if k:
        grams = data[starts[:, None] + np.arange(n, dtype=np.int64)]
        gram_arr = pa.Array.from_buffers(
            pa.binary(n), k, [None, pa.py_buffer(grams.tobytes())])
    else:
        gram_arr = pa.array([], type=pa.binary(n))
    return pa.table({
        "gram": gram_arr,
        "ghash": pa.array(hashes.view(np.int64)),
        id_col: pa.array(win_ids, type=pa.int64()),
    })


def shared_ngram_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                       n: int = 30, winnow_w: int | None = None,
                       max_bucket: int = 1 << 62):
    """Distinct document pairs (a < b) sharing a length-``n`` window
    (every window when ``winnow_w`` is None — exact; winnowing-selected
    windows otherwise — recall 1 for shared runs >= n + winnow_w - 1).

    One packed-partition hash exchange of (gram, id) rows; buckets pair
    by GRAM BYTES within each ``ghash`` partition, so a 64-bit hash
    collision costs one oversized bucket, never a wrong pair. Same-doc
    repeated grams produce a==b row pairs, dropped by the a<b filter.
    ``max_bucket`` is unbounded by default: the exact path's contract
    forbids dropping pairs (a corpus-wide boilerplate n-gram IS a
    quadratic duplicate cluster); production winnowing runs cap it and
    accept star pairs, like the LSH family (`_pair_rows_in_partition`).
    """
    # generator fn: window rows explode text ~n-fold in exact mode, so one
    # 128 MB input block would gather a multi-GB temp and emit one
    # oversized output block. Slicing the batch by a char budget and
    # YIELDING per-slice tables keeps both the gather temp and each
    # output block bounded (Ray streams yielded batches with
    # backpressure), at any document length mix.
    def windows(batch: pa.Table):
        lens = pc.binary_length(batch[text_col]).to_numpy(
            zero_copy_only=False).astype(np.int64)
        budget = 2 << 20
        cum = np.cumsum(lens)
        total = int(cum[-1]) if len(cum) else 0
        marks = np.searchsorted(cum, np.arange(budget, total, budget),
                                side="left") + 1
        cuts = np.unique(np.concatenate(
            [[0], marks, [len(lens)]])).tolist()
        for s, e in zip(cuts[:-1], cuts[1:]):
            yield ngram_window_rows(batch.slice(s, e - s), text_col,
                                    id_col, n, winnow_w)

    rows = ds.map_batches(windows, batch_format="pyarrow")
    packed = rows.map_batches(lambda b: _add_pkey(b, ["ghash"]),
                              batch_format="pyarrow")
    pairs = packed.groupby("pkey").map_groups(
        _make_partition_pairs(["gram"], id_col, max_bucket),
        batch_format="pyarrow")
    pairs = pairs.map_batches(
        lambda b: b.filter(pc.less(b["a"], b["b"])),
        batch_format="pyarrow")
    return _distinct_pairs(pairs)
