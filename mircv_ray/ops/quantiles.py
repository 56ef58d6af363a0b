"""Per-group quantiles.

``grouped_quantiles``: exact per-group continuous quantiles (the SQL
``quantile_cont`` / NumPy ``linear`` definition: rank h = (n-1)q,
interpolate the two adjacent order statistics). One hash-partition
shuffle co-locates each group; the per-task sort is the whole cost.
Partitioning assumption: one group's values fit a worker task — the
same contract as unsalted sessionize / as-of join. For groups beyond
that, the sketch path is ``grouped_quantiles_tdigest`` -like mergeable
summaries; not implemented until a workload needs it (this corpus's
groups are low-cardinality event types).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def grouped_quantiles(ds, group_col: str, value_col: str,
                      qs: dict[str, float]):
    """(group_col, <name per qs entry>) — exact linear-interpolation
    quantiles of ``value_col`` per group. NULL values are dropped (SQL
    aggregate semantics); a group with no non-null values yields nulls.
    """
    for name, q in qs.items():
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {name}={q} outside [0, 1]")
    items = list(qs.items())

    def per_group(group: pa.Table) -> pa.Table:
        v = group[value_col].drop_null().to_numpy(zero_copy_only=False)
        out: dict = {group_col: group[group_col].slice(0, 1)}
        if len(v) == 0:
            for name, _ in items:
                out[name] = pa.nulls(1, pa.float64())
            return pa.table(out)
        v = np.sort(v.astype(np.float64))
        n = len(v)
        for name, q in items:
            h = (n - 1) * q
            lo = int(np.floor(h))
            hi = min(lo + 1, n - 1)
            val = v[lo] + (h - lo) * (v[hi] - v[lo])
            out[name] = pa.array([val], type=pa.float64())
        return pa.table(out)

    from .. import use_push_shuffle
    use_push_shuffle(ds)
    return (ds.select_columns([group_col, value_col])
              .groupby(group_col)
              .map_groups(per_group, batch_format="pyarrow"))
