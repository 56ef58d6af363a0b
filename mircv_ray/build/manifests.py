"""Stage manifests: lineage + metrics, and stage-level resume.

The reference has no checkpointing (a failed build restarts from zero —
temp files deleted only at the end, InvertedIndex.java:265). The north
rule requires resumability: every build stage writes a manifest JSON
recording its inputs (lineage), row counts and per-stage metrics
(tokens/s, postings/s, bytes compressed); a stage whose manifest +
`_SUCCESS` marker exist is skipped on restart.

Output layout:
    out/_manifests/<stage>.json   (written atomically AFTER the stage's
                                   parquet lands — its presence IS the
                                   stage's success marker)
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Any


def write_manifest(out_dir: str, stage: str, payload: dict[str, Any]) -> None:
    mdir = Path(out_dir) / "_manifests"
    mdir.mkdir(parents=True, exist_ok=True)
    payload = {"stage": stage, "completed_at": time.time(), **payload}
    tmp = mdir / f".{stage}.json.tmp"
    tmp.write_text(json.dumps(payload, indent=2, default=str))
    os.replace(tmp, mdir / f"{stage}.json")  # atomic publish


def read_manifest(out_dir: str, stage: str) -> dict[str, Any] | None:
    p = Path(out_dir) / "_manifests" / f"{stage}.json"
    if not p.exists():
        return None
    return json.loads(p.read_text())


def stage_complete(out_dir: str, stage: str) -> bool:
    return read_manifest(out_dir, stage) is not None
