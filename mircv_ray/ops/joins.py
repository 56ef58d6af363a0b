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
unsalted sessionization (ops/windows.py).

``asof_join_backward_salted`` removes that assumption for mega-keys by
also partitioning on a time bucket (``on // salt_width``): round 1
resolves each (key, bucket) fragment against its own bucket's rights —
an in-bucket match is always final, because any earlier-bucket right
has a strictly smaller ``on``. The still-unmatched lefts need exactly
one piece of cross-fragment state: the per-key RUNNING BEST right as of
each bucket boundary, which is metadata-sized (one row per (key,
active bucket)). That carry table resolves against the DISTINCT (key,
bucket) pairs of the unmatched lefts (also metadata-sized) and
hash-joins back 1:1 — no task ever holds more than one (key, bucket)
fragment, one key's bucket list, or the distinct-pair table partition.
pytest pins salted ≡ unsalted on random data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _asof_core(left_ds, right_ds, by_cols: list[str], on: str,
               right_order: str, attach: dict[str, str],
               tolerance: int | None, matched_col: str | None = None,
               right_end: str | None = None,
               candidate_col: str | None = None,
               left_schema_override=None, right_schema_override=None):
    """Shared tagged-union + grouped-searchsorted resolve (see module
    docstring). ``by_cols`` may include a derived bucket column (salted
    path). When ``matched_col`` is given, a boolean column marks rows
    that found an in-group match (the salted path splits on it). With
    ``right_end``, a candidate only matches while left.on <= its end —
    the INTERVAL-containment join (right rows are [on, right_end]
    ranges). ``candidate_col`` (salted interval path) marks rows whose
    group HAD a start-wise candidate at all: an end-check failure on the
    latest-starting candidate is a FINAL null under interval semantics,
    so only candidate-less rows may consult the cross-bucket carry."""
    out_cols = list(attach.values())
    if len(set(out_cols)) != len(out_cols):
        raise ValueError("attach output names collide")

    # overrides: a derived input (e.g. the salted path's distinct-pair
    # table, an aggregate over possibly-zero rows) can have NO blocks,
    # making Dataset.schema() return None — the caller then supplies
    # the structurally-known schema instead
    left_schema = left_schema_override or left_ds.schema()
    left_names = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))
    for c in out_cols:
        if c in left_names:
            raise ValueError(f"attach output {c!r} already a left column")
    right_schema = right_schema_override or right_ds.schema()
    right_types = dict(zip(right_schema.names, right_schema.types))
    # dedupe: right_order == on (no separate tiebreak column) must not
    # produce a duplicate __r_<on> union field (KeyError in resolve)
    right_keep = [on] + ([right_order] if right_order != on else []) \
        + [c for c in attach if c not in (on, right_order)]
    if right_end is not None and right_end not in right_keep:
        right_keep.append(right_end)

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
        for k in by_cols:               # the grouping key(s)
            cols[k] = batch[k].cast(left_types[k])
        for c in right_keep:
            cols[f"__r_{c}"] = batch[c]
        cols["__side"] = pa.array(np.ones(batch.num_rows, np.int8))
        return pa.table(cols, schema=union_schema)

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.select_columns(sorted(set(by_cols + right_keep)))
                .map_batches(tag_right, batch_format="pyarrow"))

    def resolve(group: pa.Table) -> pa.Table:
        side = group["__side"].to_numpy(zero_copy_only=False)
        lmask = side == 0
        left = group.filter(pa.array(lmask))
        right = group.filter(pa.array(~lmask))
        out = {n: left[n] for n in left_names}
        nl = left.num_rows
        if nl == 0 or right.num_rows == 0:
            for c, name in attach.items():
                out[name] = pa.nulls(nl, right_types[c])
            if matched_col is not None:
                out[matched_col] = pa.array(np.zeros(nl, dtype=bool))
            if candidate_col is not None:
                out[candidate_col] = pa.array(np.zeros(nl, dtype=bool))
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
        if right_end is not None:
            ends = right[f"__r_{right_end}"].to_numpy(
                zero_copy_only=False)[order]
            matched &= l_on <= ends[np.clip(idx, 0, None)]
        safe = np.where(matched, idx, 0)
        take = pa.array(order[safe], type=pa.int64())
        valid = pa.array(matched)
        for c, name in attach.items():
            vals = right[f"__r_{c}"].combine_chunks().take(take)
            out[name] = pc.if_else(valid, vals, pa.nulls(nl, right_types[c]))
        if matched_col is not None:
            out[matched_col] = valid
        if candidate_col is not None:
            out[candidate_col] = pa.array(idx >= 0)
        return pa.table(out)

    from .. import use_push_shuffle
    use_push_shuffle(tagged)
    key = by_cols[0] if len(by_cols) == 1 else by_cols
    return tagged.groupby(key).map_groups(resolve, batch_format="pyarrow")


def asof_join_backward(left_ds, right_ds, by: str, on: str,
                       right_order: str, attach: dict[str, str],
                       tolerance: int | None = None):
    """For each left row, attach ``attach`` ({right col -> output col})
    from the last right row with same ``by`` and right.on <= left.on
    (and left.on - right.on <= tolerance, if given). Unmatched left rows
    get nulls. ``on`` / ``right_order`` must be integer-like (epoch
    micros, ids); output keeps every left column plus the attached ones.
    """
    return _asof_core(left_ds, right_ds, [by], on, right_order, attach,
                      tolerance)


def _bucket_col(on: str, salt_width: int):
    def f(batch: pa.Table) -> pa.Table:
        b = batch[on].to_numpy(zero_copy_only=False) // salt_width
        return batch.append_column("__bucket",
                                   pa.array(b, type=pa.int64()))
    return f


def asof_join_backward_salted(left_ds, right_ds, by: str, on: str,
                              right_order: str, attach: dict[str, str],
                              salt_width: int,
                              tolerance: int | None = None):
    """Mega-key as-of join: identical results to ``asof_join_backward``
    (pytest-pinned), but no task ever holds more than one (key,
    salt_width-bucket) fragment. See module docstring for the two-round
    shape. Left columns must be hash-joinable (no list types)."""
    return _salted_core(left_ds, right_ds, by, on, right_order, attach,
                        salt_width, tolerance=tolerance, right_end=None)


def _salted_core(left_ds, right_ds, by: str, on: str,
                 right_order: str, attach: dict[str, str],
                 salt_width: int, tolerance: int | None,
                 right_end: str | None):
    """Two-round salted resolve shared by the mega-key as-of and
    interval joins. With ``right_end`` (interval semantics), round 1
    splits on candidate-EXISTENCE rather than match: the latest-starting
    in-bucket candidate failing its end check is a final null (unsalted
    ``interval_join`` tests only the latest-starting interval), and the
    carry path re-applies the end check after the cross-bucket attach."""
    if salt_width <= 0:
        raise ValueError("salt_width must be positive")
    left_names = list(left_ds.schema().names)
    right_types = dict(zip(right_ds.schema().names, right_ds.schema().types))
    out_values = list(attach.values())          # the caller's outputs
    if right_end is not None and right_end not in attach:
        # the end value must survive to the carry re-check; internal
        # output column, dropped at the final projection
        attach = {**attach, right_end: "__endv"}

    lb = left_ds.map_batches(_bucket_col(on, salt_width),
                             batch_format="pyarrow")
    rb = right_ds.map_batches(_bucket_col(on, salt_width),
                              batch_format="pyarrow")

    # ---- round 1: resolve within each (key, bucket) fragment ----
    # tolerance applies here too: a within-tolerance in-bucket match is
    # final; a tolerance-violating one correctly falls through to the
    # carry path, whose even-farther candidate the final filter nulls
    round1 = _asof_core(
        lb, rb, [by, "__bucket"], on, right_order, attach,
        tolerance=tolerance, matched_col="__matched",
        right_end=right_end,
        candidate_col="__cand" if right_end is not None else None)
    split_col = "__cand" if right_end is not None else "__matched"
    drop_cols = (["__matched", "__cand"] if right_end is not None
                 else ["__matched"])

    def split_matched(want: bool):
        def f(batch: pa.Table) -> pa.Table:
            keep = batch[split_col] if want else \
                pc.invert(batch[split_col])
            return batch.filter(keep).drop_columns(drop_cols)
        return f

    resolved = round1.map_batches(split_matched(True),
                                  batch_format="pyarrow")
    unresolved = round1.map_batches(split_matched(False),
                                    batch_format="pyarrow") \
        .drop_columns(list(attach.values()))

    # ---- carry table: per-key RUNNING best right as of each bucket ----
    # (deduped like _asof_core's: right_order may equal on)
    right_keep = [on] + ([right_order] if right_order != on else []) \
        + [c for c in attach if c not in (on, right_order)]

    def batch_bests(batch: pa.Table) -> pa.Table:
        # per-batch best right per (key, bucket): sort + last-of-run
        if batch.num_rows == 0:
            return batch.select([by, "__bucket"] + right_keep)
        order = pc.sort_indices(batch, sort_keys=[
            (by, "ascending"), ("__bucket", "ascending"),
            (on, "ascending"), (right_order, "ascending")])
        t = batch.take(order)
        kb = pc.binary_join_element_wise(
            pc.cast(t[by], pa.string()),
            pc.cast(t["__bucket"], pa.string()), "\x00")
        kn = kb.to_numpy(zero_copy_only=False)
        last = np.append(kn[1:] != kn[:-1], True)
        return t.filter(pa.array(last)).select(
            [by, "__bucket"] + right_keep)

    def running_bests(group: pa.Table) -> pa.Table:
        # one key's per-(batch, bucket) bests -> per-bucket running best
        order = pc.sort_indices(group, sort_keys=[
            (on, "ascending"), (right_order, "ascending")])
        t = group.take(order)       # (on, ord) ascending => bucket asc
        bkt = t["__bucket"].to_numpy(zero_copy_only=False)
        db = np.unique(bkt)
        last_idx = np.searchsorted(bkt, db, side="right") - 1
        return t.take(pa.array(last_idx, type=pa.int64()))

    carries = (rb.map_batches(batch_bests, batch_format="pyarrow")
                 .groupby(by).map_groups(running_bests,
                                         batch_format="pyarrow"))

    # unresolved's schema is KNOWN structurally (left columns +
    # __bucket) — never ask the dataset: when round 1 resolves every
    # left, the empty groupby-count path yields zero-column blocks and
    # Dataset.schema() returns None
    left_schema0 = left_ds.schema()
    un_types = dict(zip(left_schema0.names, left_schema0.types))
    un_types["__bucket"] = pa.int64()
    un_names = left_names + ["__bucket"]
    un_schema = pa.schema([(n, un_types[n]) for n in un_names])

    # ---- round 2: only the DISTINCT (key, bucket) pairs of the
    # unresolved lefts consult the carry table (both metadata-sized) ----
    pair_schema = pa.schema([(by, un_types[by]),
                             ("__bucket", pa.int64()),
                             ("__prev", pa.int64())])

    def to_pairs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or b.num_columns == 0:
            return pair_schema.empty_table()
        bkt = b["__bucket"].cast(pa.int64())
        return pa.table({by: b[by].cast(un_types[by]), "__bucket": bkt,
                         "__prev": pc.add(bkt, -1).cast(pa.int64())},
                        schema=pair_schema)

    pairs = unresolved.groupby([by, "__bucket"]).count() \
        .map_batches(to_pairs, batch_format="pyarrow")
    carry_schema = pa.schema(
        [(by, right_types.get(by, un_types[by])), ("__prev", pa.int64())]
        + [(c, right_types[c]) for c in right_keep])
    carry_hits = _asof_core(
        pairs, carries.map_batches(
            lambda b: b.rename_columns(
                [{"__bucket": "__prev"}.get(n, n)
                 for n in b.schema.names]), batch_format="pyarrow"),
        [by], "__prev", right_order,
        attach, tolerance=None,
        left_schema_override=pair_schema,
        right_schema_override=carry_schema).drop_columns(["__prev"])
    # equijoin back to the unresolved lefts via the same tagged-union
    # groupby pattern (exactly one carry row per (key, bucket) group;
    # Dataset.join is avoided — the sort exchange upstream can emit
    # zero-column empty blocks acero's hash join rejects)
    jfields = [(n, un_types[n]) for n in un_schema.names]
    jfields += [(attach[c], right_types[c]) for c in attach]
    jfields += [("__side", pa.int8())]
    jschema = pa.schema(jfields)

    def tag_unresolved(batch: pa.Table) -> pa.Table:
        cols = {n: batch[n] for n in un_schema.names}
        for c in attach:
            cols[attach[c]] = pa.nulls(batch.num_rows, right_types[c])
        cols["__side"] = pa.array(np.zeros(batch.num_rows, np.int8))
        return pa.table(cols, schema=jschema)

    def tag_carry(batch: pa.Table) -> pa.Table:
        cols = {n: pa.nulls(batch.num_rows, un_types[n])
                for n in un_schema.names}
        cols[by] = batch[by].cast(un_types[by])
        cols["__bucket"] = batch["__bucket"].cast(pa.int64())
        for c in attach:
            cols[attach[c]] = batch[attach[c]]
        cols["__side"] = pa.array(np.ones(batch.num_rows, np.int8))
        return pa.table(cols, schema=jschema)

    def attach_carry(group: pa.Table) -> pa.Table:
        side = group["__side"].to_numpy(zero_copy_only=False)
        lefts = group.filter(pa.array(side == 0))
        carry = group.filter(pa.array(side == 1))
        nl = lefts.num_rows
        out = {n: lefts[n] for n in un_schema.names}
        zero = pa.array(np.zeros(nl, dtype=np.int64))
        for c in attach:
            if carry.num_rows:
                out[attach[c]] = carry[attach[c]].combine_chunks() \
                    .take(zero)
            else:
                out[attach[c]] = pa.nulls(nl, right_types[c])
        return pa.table(out)

    joined = unresolved.map_batches(
        tag_unresolved, batch_format="pyarrow").union(
        carry_hits.map_batches(tag_carry, batch_format="pyarrow")) \
        .groupby([by, "__bucket"]) \
        .map_groups(attach_carry, batch_format="pyarrow")
    if right_end is not None:
        end_out = attach[right_end]

        def end_filter(batch: pa.Table) -> pa.Table:
            # the carry row is the latest-starting interval from an
            # earlier bucket; containment still requires on <= its end.
            # A null end (no carry hit) keeps the already-null attaches.
            ok = pc.or_kleene(pc.less_equal(batch[on], batch[end_out]),
                              pc.is_null(batch[end_out]))
            out = {c: batch[c] for c in batch.schema.names}
            for c, name in attach.items():
                out[name] = pc.if_else(ok, batch[name],
                                       pa.nulls(batch.num_rows,
                                                right_types[c]))
            return pa.table(out)
        joined = joined.map_batches(end_filter, batch_format="pyarrow")
    if tolerance is not None:
        on_out = attach.get(on)
        if on_out is None:
            raise ValueError("tolerance with salting requires attaching "
                             f"the {on!r} column (needed to re-check the "
                             "carry distance)")

        def tol_filter(batch: pa.Table) -> pa.Table:
            dist = pc.subtract(batch[on], batch[on_out])
            ok = pc.or_kleene(pc.less_equal(dist, tolerance),
                              pc.is_null(batch[on_out]))
            out = {c: batch[c] for c in batch.schema.names}
            for c, name in attach.items():
                out[name] = pc.if_else(ok, batch[name],
                                       pa.nulls(batch.num_rows,
                                                right_types[c]))
            return pa.table(out)
        joined = joined.map_batches(tol_filter, batch_format="pyarrow")

    out_names = left_names + out_values    # internal __endv never escapes

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(out_names)
    return resolved.map_batches(project, batch_format="pyarrow").union(
        joined.map_batches(project, batch_format="pyarrow"))


def interval_join(left_ds, intervals_ds, by: str, on: str,
                  start_col: str, end_col: str, attach: dict[str, str],
                  interval_order: str | None = None):
    """Range-containment join: attach, to every left row, the columns of
    the interval [start_col, end_col] (inclusive both ends) of the same
    ``by`` key that CONTAINS its ``on`` value. Unmatched rows get nulls.

    Exact for DISJOINT interval tables (sessions, tumbling windows) —
    the common case this targets. When intervals of a key overlap, only
    the latest-starting interval with start <= on is tested (ties by
    ``interval_order`` ascending, last wins); an earlier interval that
    also contains ``on`` is not considered. Same distribution shape as
    the as-of join: one tagged-union shuffle, per-key vectorized
    searchsorted + end check.
    """
    intervals_ds, attach, interval_order, end_col = _prep_interval_args(
        intervals_ds, on, start_col, end_col, attach, interval_order)
    return _asof_core(left_ds, intervals_ds, [by], on, interval_order,
                      attach, tolerance=None, right_end=end_col)


def _prep_interval_args(intervals_ds, on: str, start_col: str,
                        end_col: str, attach: dict,
                        interval_order: str | None):
    """Shared interval-join preamble (unsalted + salted): present the
    interval start under the left's ``on`` name (the core resolves
    left.on against the right column of the same name), remap attach /
    order / end references accordingly, and reject ambiguous schemas."""
    if interval_order is None:
        interval_order = end_col
    if start_col != on:
        if on in intervals_ds.schema().names:
            raise ValueError(
                f"intervals already have a column named {on!r}; rename "
                "one side to disambiguate the join key")

        def rename(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(
                [{start_col: on}.get(n, n) for n in batch.schema.names])

        intervals_ds = intervals_ds.map_batches(rename,
                                                batch_format="pyarrow")
    attach = {({start_col: on}.get(c, c)): out
              for c, out in attach.items()}
    interval_order = {start_col: on}.get(interval_order, interval_order)
    return (intervals_ds, attach, interval_order,
            {start_col: on}.get(end_col, end_col))


def interval_join_salted(left_ds, intervals_ds, by: str, on: str,
                         start_col: str, end_col: str,
                         attach: dict[str, str], salt_width: int,
                         interval_order: str | None = None):
    """Mega-key interval join: identical results to ``interval_join``
    (pytest-pinned) but no task ever holds more than one (key,
    salt_width-bucket) fragment of events or intervals — the as-of
    join's bucket + carry machinery with intervals as right rows
    carrying their ends. Round 1 resolves each left against intervals
    STARTING in its own bucket; only lefts whose bucket has no
    start-wise candidate consult the per-key running-interval carry
    (an in-bucket candidate failing its end check is a final null,
    matching the unsalted latest-starting-only semantics)."""
    intervals_ds, attach, interval_order, end_col = _prep_interval_args(
        intervals_ds, on, start_col, end_col, attach, interval_order)
    return _salted_core(left_ds, intervals_ds, by, on, interval_order,
                        attach, salt_width, tolerance=None,
                        right_end=end_col)
