"""Stopword list loader.

The list is the reference's `search_engine/utils/stopwords.txt` (1297
English stopwords, vendored verbatim as data) — the tokenizer must drop
exactly these terms when parse=True
(search_engine/src/main/java/unipi/aide/mircv/parsing/Parser.java:104-119).
Loaded once per process (module-level cache) — the reference lazily loads
it into a static list the same way.
"""

from __future__ import annotations

import functools
from pathlib import Path

_DATA = Path(__file__).parent / "data" / "stopwords.txt"


@functools.lru_cache(maxsize=1)
def load_stopwords() -> frozenset[str]:
    return frozenset(_DATA.read_text().splitlines())
