"""Index build pipeline (Ray Data)."""

from .index_build import build_index, load_stats
from .manifests import write_manifest, read_manifest, stage_complete
from .merge import merge_indexes
from .pruning import prune_index
from .upsert import upsert_docs
from .positions import (build_positions_index, phrase_match_positional,
                        proximity_min_span, read_term_positions)
from .tombstones import (clear_tombstones, delete_docs, load_tombstones,
                         reshard_index, vacuum_index)

__all__ = ["build_index", "load_stats", "merge_indexes", "prune_index", "upsert_docs", "delete_docs",
           "load_tombstones", "clear_tombstones", "vacuum_index", "reshard_index",
           "write_manifest", "read_manifest", "stage_complete",
           "build_positions_index", "phrase_match_positional",
           "read_term_positions", "proximity_min_span"]
