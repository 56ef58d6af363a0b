"""Index build pipeline (Ray Data)."""

from .index_build import build_index, load_stats
from .manifests import write_manifest, read_manifest, stage_complete

__all__ = ["build_index", "load_stats", "write_manifest", "read_manifest",
           "stage_complete"]
