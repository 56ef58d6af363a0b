"""As-of join — the time-series join Ray Data lacks.

``asof_join_backward(left, right, by, on, ...)`` attaches, to every left
row, the columns of the LAST right row of the same ``by`` key whose
``on`` value is <= the left row's (inclusive backward as-of; ties on
``on`` break by ``right_order`` ascending, last wins — fully
deterministic, so the result is SQL-oracle-checkable).

Distribution shape: both sides are tagged and union'd so ONE
hash-partition shuffle co-locates each key's rows; inside each grouped
task the right side is sorted once and every left row resolves with a
single vectorized ``searchsorted`` (no per-row Python). The partitioning
assumption — one ``by`` key's rows fit a worker task — is the same as
unsalted sessionization (ops/windows.py); for mega-keys the same
day-salting treatment applies, with the last right row before each salt
boundary carried as fragment state (not implemented until a workload
needs it; documented here so the assumption is explicit).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def asof_join_backward(left_ds, right_ds, by: str, on: str,
                       right_order: str, attach: dict[str, str],
                       tolerance: int | None = None):
    """For each left row, attach ``attach`` ({right col -> output col})
    from the last right row with same ``by`` and right.on <= left.on
    (and left.on - right.on <= tolerance, if given). Unmatched left rows
    get nulls. ``on`` / ``right_order`` must be integer-like (epoch
    micros, ids); output keeps every left column plus the attached ones.
    """
    out_cols = list(attach.values())
    if len(set(out_cols)) != len(out_cols):
        raise ValueError("attach output names collide")

    left_schema = left_ds.schema()
    left_names = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))
    for c in out_cols:
        if c in left_names:
            raise ValueError(f"attach output {c!r} already a left column")
    right_schema = right_ds.schema()
    right_types = dict(zip(right_schema.names, right_schema.types))
    right_keep = [on, right_order] + [c for c in attach
                                      if c not in (on, right_order)]

    # one union schema both sides cast to: left payload + right payload
    # + side tag (rows carry nulls for the other side's columns)
    fields = [(n, left_types[n]) for n in left_names]
    fields += [(f"__r_{c}", right_types[c]) for c in right_keep]
    fields += [("__side", pa.int8())]
    union_schema = pa.schema(fields)

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {n: batch[n] for n in left_names}
        for c in right_keep:
            cols[f"__r_{c}"] = pa.nulls(batch.num_rows, right_types[c])
        cols["__side"] = pa.array(np.zeros(batch.num_rows, np.int8))
        return pa.table(cols, schema=union_schema)

    def tag_right(batch: pa.Table) -> pa.Table:
        cols = {n: pa.nulls(batch.num_rows, left_types[n])
                for n in left_names}
        cols[by] = batch[by].cast(left_types[by])   # the grouping key
        for c in right_keep:
            cols[f"__r_{c}"] = batch[c]
        cols["__side"] = pa.array(np.ones(batch.num_rows, np.int8))
        return pa.table(cols, schema=union_schema)

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.select_columns(sorted(set([by] + right_keep)))
                .map_batches(tag_right, batch_format="pyarrow"))

    def resolve(group: pa.Table) -> pa.Table:
        side = group["__side"].to_numpy(zero_copy_only=False)
        lmask = side == 0
        left = group.filter(pa.array(lmask))
        right = group.filter(pa.array(~lmask))
        out = {n: left[n] for n in left_names}
        nl = left.num_rows
        if nl == 0:
            return pa.table(
                {**{n: left[n] for n in left_names},
                 **{attach[c]: pa.nulls(0, right_types[c])
                    for c in attach}})
        if right.num_rows == 0:
            for c, name in attach.items():
                out[name] = pa.nulls(nl, right_types[c])
            return pa.table(out)
        r_on = right[f"__r_{on}"].to_numpy(zero_copy_only=False)
        r_ord = right[f"__r_{right_order}"].to_numpy(zero_copy_only=False)
        order = np.lexsort((r_ord, r_on))
        r_on = r_on[order]
        l_on = left[on].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(r_on, l_on, side="right") - 1
        matched = idx >= 0
        if tolerance is not None:
            matched &= (l_on - r_on[np.clip(idx, 0, None)]) <= tolerance
        safe = np.where(matched, idx, 0)
        take = pa.array(order[safe], type=pa.int64())
        valid = pa.array(matched)
        for c, name in attach.items():
            vals = right[f"__r_{c}"].combine_chunks().take(take)
            out[name] = pc.if_else(valid, vals, pa.nulls(nl, right_types[c]))
        return pa.table(out)

    from .. import use_push_shuffle
    use_push_shuffle(tagged)
    return tagged.groupby(by).map_groups(resolve, batch_format="pyarrow")
