"""Text-analysis operators over a document table (vectorized map_batches).

All stateless, Arrow-native (pyarrow.compute regex kernels — no Python
loop over rows in any hot path). Each has a DuckDB-expressible
definition where feasible so the driver's oracle gate can check it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..text.tokenizer import Tokenizer
from ..util import binary_column_values

# BPE-ish word pattern: alpha runs, digit runs, or single non-space symbol
TOKEN_COUNT_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_RE = r"[!-/:-@\[-`{-~]"

_EN_MARKERS = frozenset("the of and to in is that it for on with as are this".split())
_IT_MARKERS = frozenset("il di che la e per una non sono con del le si".split())
_DE_MARKERS = frozenset("der die das und ist nicht mit ein für auf den".split())
_FR_MARKERS = frozenset("le la les de et un une est pour dans que sur".split())
_CODE_MARKERS = frozenset("def return import class void int self fn func var const".split())
_LANGS = [("en", _EN_MARKERS), ("it", _IT_MARKERS), ("de", _DE_MARKERS),
          ("fr", _FR_MARKERS), ("code", _CODE_MARKERS)]


def basic_token_stats(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """(doc_id, doc_len) with the SQL-checkable basic tokenizer."""
    tok = Tokenizer(parse=False, squeeze=False, content_col=text_col)
    content = batch[text_col]
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    _, doc_len = tok.tokenize_column(content)
    return pa.table({id_col: batch[id_col],
                     "doc_len": pa.array(doc_len, type=pa.int64())})


def token_count(batch: pa.Table, text_col: str = "text",
                id_col: str = "doc_id") -> pa.Table:
    """(doc_id, n_tokens) under the BPE-ish token regex."""
    n = pc.count_substring_regex(batch[text_col], TOKEN_COUNT_RE)
    return pa.table({id_col: batch[id_col],
                     "n_tokens": n.combine_chunks().cast(pa.int64())
                     if isinstance(n, pa.ChunkedArray) else n.cast(pa.int64())})


def quality_stats(batch: pa.Table, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    """Integer quality counters (SQL-checkable): chars, punct, digits,
    uppercase, whitespace."""
    t = batch[text_col]
    def cnt(pat):
        c = pc.count_substring_regex(t, pat)
        c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        return c.cast(pa.int64())
    n_chars = pc.utf8_length(t)
    n_chars = (n_chars.combine_chunks() if isinstance(n_chars, pa.ChunkedArray)
               else n_chars).cast(pa.int64())
    return pa.table({
        id_col: batch[id_col],
        "n_chars": n_chars,
        "n_punct": cnt(PUNCT_RE),
        "n_digits": cnt(r"[0-9]"),
        "n_upper": cnt(r"[A-Z]"),
        "n_spaces": cnt(r" "),
    })


def lang_id(batch: pa.Table, text_col: str = "text",
            id_col: str = "doc_id") -> pa.Table:
    """Marker-word voting language heuristic (n-gram-free, deterministic).

    Counts whole-word marker hits per language; ties and zero evidence
    resolve to 'unknown'. Vectorized: one count_substring_regex per
    marker set.
    """
    t = batch[text_col]
    lowered = pc.utf8_lower(t)
    votes = []
    for name, markers in _LANGS:
        pat = r"\b(" + "|".join(sorted(markers)) + r")\b"
        c = pc.count_substring_regex(lowered, pat)
        c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        votes.append(c.to_numpy(zero_copy_only=False).astype(np.int64))
    votes = np.stack(votes, axis=1)
    best = votes.argmax(axis=1)
    best_cnt = votes.max(axis=1)
    second = np.sort(votes, axis=1)[:, -2] if votes.shape[1] > 1 else np.zeros(len(best))
    labels = np.array([name for name, _ in _LANGS])[best]
    labels = np.where((best_cnt == 0) | (best_cnt == second), "unknown", labels)
    return pa.table({id_col: batch[id_col],
                     "lang_pred": pa.array(labels.tolist(), type=pa.string()),
                     "lang_votes": pa.array(best_cnt, type=pa.int64())})


_FP_BASE = np.uint64(1099511628211)


def fingerprint(batch: pa.Table, text_col: str = "text",
                id_col: str = "doc_id") -> pa.Table:
    """64-bit polynomial rolling-hash fingerprint over UTF-8 bytes:
    ``h(doc) = sum(b[i] * P^(n-1-i)) mod 2^64``.

    Fully vectorized: one concatenated byte buffer per batch, a power
    table ``P^k`` built by wrapping uint64 cumprod, per-position products
    segment-summed with ``np.add.reduceat`` — order-dependent (rolling)
    but no Python loop over bytes or docs.
    """
    t = batch[text_col]
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    bin_arr = t.cast(pa.binary())
    lens = pc.fill_null(pc.binary_length(bin_arr), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    # one aligned copy of the arrow value buffer (nulls occupy 0 bytes,
    # matching the fill_null(0) lengths) — no to_pylist over content
    buf = binary_column_values(bin_arr, np.uint8).astype(np.uint64)
    n_docs = len(lens)
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(buf):
        ends = np.cumsum(lens)
        starts = ends - lens
        max_len = int(lens.max())
        pows = np.ones(max_len, dtype=np.uint64)
        if max_len > 1:
            with np.errstate(over="ignore"):
                pows[1:] = np.cumprod(np.full(max_len - 1, _FP_BASE,
                                              dtype=np.uint64))
        # exponent at flat position j (doc d): (ends[d]-1) - j
        parent = np.repeat(np.arange(n_docs), lens)
        expo = (ends[parent] - 1) - np.arange(len(buf))
        with np.errstate(over="ignore"):
            prod = buf * pows[expo]
        nz = lens > 0
        seg = np.add.reduceat(prod, starts[nz])
        out[nz] = seg
    return pa.table({id_col: batch[id_col],
                     "fingerprint": pa.array(out.astype(np.int64))})


class ContaminationCheck:
    """Benchmark-decontamination scan: flag documents that contain any
    of a set of probe strings VERBATIM (the exact-match half of the
    standard LLM training-data decontamination recipe; the fuzzy half is
    ``ngram_jaccard_pairs`` / ``minhash_candidate_pairs`` against the
    probe corpus).

    Scale design: the probe suite is the SMALL side (benchmark test
    sets are ≤ MBs even for large eval suites) — it ships once in the
    constructor (once per map_batches actor, NOT per batch) and is
    compiled into a single re2 alternation, so the per-batch cost is ONE
    vectorized ``match_substring_regex`` pass; the corpus streams
    through ``map_batches`` and never shuffles.  Per-probe hit counts
    run additional per-probe kernels only over the (typically tiny)
    contaminated subset.  For probe suites too large for one alternation
    (millions of strings), split probes across several
    ``ContaminationCheck`` stages or pre-filter with a Bloom/ngram
    bucket pass — the per-stage contract is unchanged.
    """

    def __init__(self, probes, text_col: str = "text",
                 id_col: str = "doc_id"):
        if not probes:
            raise ValueError("probes must be a non-empty list of strings")
        import re as _re
        self.probes = [str(p) for p in probes]
        self.pattern = "|".join(_re.escape(p) for p in self.probes)
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch[self.text_col]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        any_hit = pc.fill_null(
            pc.match_substring_regex(t, self.pattern), False)
        hit_np = any_hit.to_numpy(zero_copy_only=False)
        n_hits = np.zeros(len(t), dtype=np.int64)
        idx = np.flatnonzero(hit_np)
        if len(idx):
            sub = t.take(pa.array(idx, type=pa.int64()))
            for p in self.probes:
                m = pc.fill_null(pc.match_substring(sub, p), False)
                n_hits[idx] += m.to_numpy(zero_copy_only=False)
        return pa.table({
            self.id_col: batch[self.id_col],
            "n_probes_hit": pa.array(n_hits, type=pa.int64()),
            "contaminated": pa.array(hit_np, type=pa.bool_()),
        })


def contamination_check(ds, probes, text_col: str = "text",
                        id_col: str = "doc_id"):
    """(doc_id, n_probes_hit, contaminated) for every document."""
    return ds.map_batches(ContaminationCheck(probes, text_col, id_col),
                          batch_format="pyarrow")
