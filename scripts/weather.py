"""Host-memory weather monitor.

Logs the first-touch probe (ms per MB to fault freshly mapped anonymous
memory — see BASELINE.md "weather") to a JSONL timeline. The sandbox
VM's host episodically makes fresh-page faults ~1000x slower; this
timeline tells you which bench samples ran in which conditions without
re-deriving it from per-rep stamps.

Usage:  python scripts/weather.py [--interval SEC] [--out PATH]
Stop with Ctrl-C; the probe itself costs ~10 ms healthy (16 MB touch).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def probe(mb: int = 16) -> float:
    # raw anonymous mmap so every probe faults FRESH pages — a heap
    # buffer gets retained by glibc's adaptive mmap threshold after the
    # first call and would measure warm pages forever (see bench.py)
    import mmap

    import numpy as np
    m = mmap.mmap(-1, mb * 1024 * 1024)
    v = np.frombuffer(memoryview(m), dtype=np.uint8)
    t0 = time.perf_counter()
    v[::4096] = 1
    dt = (time.perf_counter() - t0) * 1000.0 / mb
    del v
    m.close()
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=float, default=30.0)
    ap.add_argument("--out", default="/tmp/mircv_weather.jsonl")
    ap.add_argument("--count", type=int, default=0,
                    help="number of probes (0 = until interrupted)")
    args = ap.parse_args()
    n = 0
    while args.count == 0 or n < args.count:
        ms = probe()
        with open(args.out, "a") as f:
            f.write(json.dumps({"ts": round(time.time(), 1),
                                "when": time.strftime("%H:%M:%S"),
                                "ms_per_mb": round(ms, 2)}) + "\n")
        n += 1
        time.sleep(args.interval)


if __name__ == "__main__":
    main()
