"""Reference-parity tokenizer.

Reproduces `Parser.getTokens`
(search_engine/src/main/java/unipi/aide/mircv/parsing/Parser.java:34-90)
step for step:

  M2  HTML strip          ``<[^>]+>`` -> space
  M3  punctuation strip   Java ``\\p{Punct}`` (the 32 ASCII punct chars) -> space
  M4  lowercase, then split on a SINGLE space; empty words dropped
  M5  keep word only if UTF-8 byte length < 64 (Lexicon.TERM_DIMENSION)
  M6  drop word if it contains any non-ASCII char (dropped, not cleaned)
  --  Java ``String.trim()`` (strips chars <= U+0020 from both ends)
  M7  collapse runs of >2 identical non-digit chars to exactly 2
      (digits exempt; words of length <= 2 unchanged)
  M8  stopword removal (parse=True only; vendored reference list)
  M9  Porter stemming (parse=True only)

Reference quirk kept in reference mode: a whitespace-only word survives as
the empty token "" (non-empty pre-trim, length <= 2 post-trim so returned
unchanged by the squeeze, Parser.java:48,53,64-65). The SQL-checkable
"basic" mode (squeeze=False) instead drops empty-after-trim tokens so the
semantics are expressible in DuckDB's RE2 (no backreferences -> no squeeze).

The batch path (`Tokenizer`) is vectorized: regex/lower/split/byte-length/
ASCII filters run as pyarrow.compute kernels over the whole batch; the
residual per-token work (trim/squeeze/stopword/stem) runs once per UNIQUE
token via dictionary encoding with a per-process memo cache — vocabulary
repeats heavily, so the hot path is Arrow take/filter, not a Python loop
over rows.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .porter import stem
from .stopwords import load_stopwords

_HTML_RE = "<[^>]+>"
# Java \p{Punct}: !"#$%&'()*+,-./:;<=>?@[\]^_`{|}~
_PUNCT_RE = r"[!-/:-@\[-`{-~]"
_NON_ASCII_RE = r"[^\x00-\x7F]"

_html = re.compile(_HTML_RE)
_punct = re.compile(_PUNCT_RE)
_non_ascii = re.compile(_NON_ASCII_RE)
_squeeze_re = re.compile(r"([^0-9])\1{2,}")

_JAVA_WS = "".join(chr(c) for c in range(0x21))  # String.trim(): chars <= U+0020


def java_trim(s: str) -> str:
    return s.strip(_JAVA_WS)


def squeeze_token(token: str) -> str:
    """Parser.removeConsecutiveCharacter (Parser.java:63-90)."""
    if len(token) <= 2:
        return token
    return _squeeze_re.sub(r"\1\1", token)


def tokenize_text(text: str, parse: bool, squeeze: bool = True,
                  term_dimension: int = 64) -> list[str]:
    """Single-string tokenizer (query path + oracle). Reference semantics."""
    text = _html.sub(" ", text)
    text = _punct.sub(" ", text)
    tokens: list[str] = []
    stopwords = load_stopwords() if parse else None
    for word in text.lower().split(" "):
        if not word or len(word.encode("utf-8")) >= term_dimension:
            continue
        if _non_ascii.search(word):
            continue
        word = java_trim(word)
        if squeeze:
            word = squeeze_token(word)
        elif not word:
            continue  # basic mode drops the empty-token quirk
        tokens.append(word)
    if parse:
        tokens = [stem(t) for t in tokens if t not in stopwords]
    return tokens


class Tokenizer:
    """Batch tokenizer for ``map_batches`` (Arrow in / Arrow out).

    Adds ``tokens: list<string>`` and ``doc_len: int64`` columns computed
    from ``content``. Stateful setup (stopword set, memo cache) happens
    once per actor/worker in ``__init__``.
    """

    def __init__(self, parse: bool = True, squeeze: bool = True,
                 term_dimension: int = 64, content_col: str = "content"):
        self.parse = parse
        self.squeeze = squeeze
        self.term_dimension = term_dimension
        self.content_col = content_col
        self.stopwords = load_stopwords() if parse else frozenset()
        self._memo: dict[str, str | None] = {}

    def _finalize_token(self, word: str) -> str | None:
        """trim + squeeze + stopword + stem for one unique raw word.

        Returns None when the token is dropped (stopword / basic-mode empty).
        """
        word = java_trim(word)
        if self.squeeze:
            word = squeeze_token(word)
        elif not word:
            return None
        if self.parse:
            if word in self.stopwords:
                return None
            word = stem(word)
        return word

    def tokenize_column(self, content: pa.Array) -> tuple[pa.ListArray, np.ndarray]:
        """Vectorized M2..M9 over a string column.

        Returns (tokens list array, doc_len int64 numpy array).
        """
        n = len(content)
        txt = pc.replace_substring_regex(content, pattern=_HTML_RE, replacement=" ")
        txt = pc.replace_substring_regex(txt, pattern=_PUNCT_RE, replacement=" ")
        txt = pc.utf8_lower(txt)
        lists = pc.split_pattern(txt, pattern=" ")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        # vectorized filters: non-empty, <64 UTF-8 bytes, pure ASCII
        keep = pc.and_(
            pc.and_(pc.greater(pc.binary_length(flat), 0),
                    pc.less(pc.binary_length(flat), self.term_dimension)),
            pc.invert(pc.match_substring_regex(flat, _NON_ASCII_RE)),
        )
        flat = flat.filter(keep)
        parent = parent.filter(keep)
        # residual per-token work once per unique token (dictionary encode)
        dict_arr = pc.dictionary_encode(flat)
        if isinstance(dict_arr, pa.ChunkedArray):
            dict_arr = dict_arr.combine_chunks()
        vocab = dict_arr.dictionary.to_pylist()
        memo = self._memo
        fin = self._finalize_token
        mapping = [memo[w] if w in memo else memo.setdefault(w, fin(w)) for w in vocab]
        mapped = pa.array(mapping, type=pa.string()).take(dict_arr.indices)
        kept = mapped.is_valid()
        final_flat = mapped.filter(kept)
        parent_np = parent.to_numpy(zero_copy_only=False)[kept.to_numpy(zero_copy_only=False)]
        doc_len = np.bincount(parent_np, minlength=n).astype(np.int64)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(doc_len, out=offsets[1:])
        tokens = pa.LargeListArray.from_arrays(offsets, final_flat.combine_chunks()
                                               if isinstance(final_flat, pa.ChunkedArray)
                                               else final_flat)
        return tokens, doc_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        content = batch[self.content_col]
        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()
        tokens, doc_len = self.tokenize_column(content)
        return batch.append_column("tokens", tokens).append_column(
            "doc_len", pa.array(doc_len, type=pa.int64()))
