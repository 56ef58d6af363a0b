"""Index build pipeline (Ray Data)."""

from .index_build import build_index, load_stats
from .manifests import write_manifest, read_manifest, stage_complete
from .merge import merge_indexes

__all__ = ["build_index", "load_stats", "merge_indexes", "write_manifest",
           "read_manifest", "stage_complete"]
