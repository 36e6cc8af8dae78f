"""Distributed joins (SURVEY.md B20/B23 wide-op family).

Two shapes, chosen by side size:
  - broadcast join: tiny side shipped once, lookup inside map_batches
    (`pipelines/query.hydrate_results` is the canonical instance);
  - hash join (here): both sides hash-partitioned on the key through the
    keyed cogroup exchange, then Arrow's C++ join kernel runs
    per-partition — equal keys are co-located, so the union of
    per-partition joins IS the global join. Neither side is ever
    materialized whole; per-task state is one partition of each side.

Supported: inner, left outer, right outer, full outer, left semi, left
anti. Outer null-emission is partition-local and still exact: a key
hashes to exactly one partition, so a row unmatched within its
partition is unmatched globally.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..stages.exchange import keyed_cogroup_map

_JOIN_TYPES = {
    "inner": "inner",
    "left": "left outer",
    "right": "right outer",
    "full": "full outer",
    "semi": "left semi",
    "anti": "left anti",
}


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    left_on: str,
    right_on: str,
    how: str = "inner",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Distributed hash join of two Datasets on a single key column.

    ``how``: inner | left | right | full | semi | anti (left-side
    semantics). Key columns may be named differently; the output carries
    the LEFT key name only (Arrow coalesces it with the right key, so
    right-unmatched rows of an outer join keep their key value)."""
    if how not in _JOIN_TYPES:
        raise ValueError(f"how must be one of {sorted(_JOIN_TYPES)}, got {how!r}")
    join_type = _JOIN_TYPES[how]

    def do_join(lp: pa.Table, rp: pa.Table) -> pa.Table:
        # within a partition every equal key is present on both sides ->
        # Arrow's C++ hash join computes the partition's share exactly
        return lp.join(
            rp, keys=left_on, right_keys=right_on, join_type=join_type,
            right_suffix="_r", use_threads=False,
        )

    do_join.__name__ = f"hash_join_{how}"
    return keyed_cogroup_map(
        left, right, [left_on], [right_on], do_join,
        num_partitions=num_partitions,
    )


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    out_col: str,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Backward-strict AS-OF join: every left row gains ``out_col`` = the
    greatest right ``right_ts`` with the same key and right_ts < left_ts
    (null when no earlier right row exists). Equivalent to DuckDB's
    ``ASOF LEFT JOIN ... ON key = key AND l.ts > r.ts`` projected to the
    matched timestamp.

    Distribution: one keyed cogroup exchange on the key; inside a
    partition, rights are sorted per key and each key-run of left rows
    is resolved with ONE vectorized searchsorted. The partitioning
    assumption is only that equal keys co-locate — no global time sort."""
    import numpy as np

    def per_partition(lp: pa.Table, rp: pa.Table) -> pa.Table:
        ts_type = lp.schema.field(left_ts).type
        if lp.num_rows == 0:
            return lp.append_column(out_col, pa.array([], ts_type))
        def _int_ts(col):
            # NULL timestamps must stay null: .to_numpy on a nullable
            # column goes through float64 NaN, and searchsorted(NaN)
            # lands past the end — a null left ts would silently match
            # the LATEST right row instead of none
            arr = col.cast(pa.int64())
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            valid = ~np.asarray(arr.is_null())
            vals = arr.fill_null(0).to_numpy(zero_copy_only=False)
            return vals.astype(np.int64), valid

        lk = lp.column(left_key).to_numpy(zero_copy_only=False).astype(np.int64)
        lt, lt_ok = _int_ts(lp.column(left_ts))
        rk = rp.column(right_key).to_numpy(zero_copy_only=False).astype(np.int64)
        rt, rt_ok = _int_ts(rp.column(right_ts))
        if not rt_ok.all():  # a null right ts is never "earlier"
            rk, rt = rk[rt_ok], rt[rt_ok]
        r_order = np.lexsort((rt, rk))
        rk, rt = rk[r_order], rt[r_order]
        out = np.full(len(lk), np.iinfo(np.int64).min, dtype=np.int64)
        l_order = np.argsort(lk, kind="stable")
        lk_s = lk[l_order]
        runs = np.concatenate(([0], np.flatnonzero(lk_s[1:] != lk_s[:-1]) + 1,
                               [len(lk_s)]))
        for i in range(len(runs) - 1):
            sel = l_order[runs[i]: runs[i + 1]]
            key = lk_s[runs[i]]
            lo = int(np.searchsorted(rk, key, side="left"))
            hi = int(np.searchsorted(rk, key, side="right"))
            if lo == hi:
                continue
            seg = rt[lo:hi]
            pos = np.searchsorted(seg, lt[sel], side="left") - 1
            ok = (pos >= 0) & lt_ok[sel]
            out[sel[ok]] = seg[pos[ok]]
        import pyarrow.compute as pc

        valid = out != np.iinfo(np.int64).min
        col = pc.if_else(
            pa.array(valid), pa.array(out, pa.int64()),
            pa.scalar(None, pa.int64()),
        ).cast(ts_type)
        return lp.append_column(out_col, col)

    return keyed_cogroup_map(
        left, right, [left_key], [right_key], per_partition,
        num_partitions=num_partitions,
    )


def _bloom_keys(col: pa.Array | pa.ChunkedArray):
    """Exact int64 keys + validity mask for bloom hashing. A plain
    `.to_numpy(zero_copy_only=False)` on a NULLABLE int column goes
    through float64 (NaN for nulls), which rounds keys above 2^53 and
    silently breaks the filter's no-false-negative guarantee — so fill
    nulls first (the int path stays exact) and report null positions
    separately. Null keys never equal anything under join semantics:
    callers hash only valid keys and treat null probes as
    'definitely absent'."""
    import numpy as np
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    valid = None
    if col.null_count:
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        col = pc.fill_null(col, 0)
    keys = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
    if keys.dtype != np.int64:  # defensive: cast above guarantees int64
        keys = keys.astype(np.int64)
    return keys, valid


def _build_bloom_ref(build: ray.data.Dataset, build_on: str):
    """Build a Bloom filter of `build`'s non-null keys and ship it once
    via ray.put. Per-batch partial bitsets (one O(n_words) row per batch
    leaves each worker) are OR-merged on the driver — n_words uint64s is
    1.25 GB/10^9 build keys, the broadcast budget that motivates
    blooming only the SMALL side. Returns (filt_ref, n_words)."""
    import numpy as np
    import ray

    from ..functions import bloom
    from ..util import dataset_to_table

    n_keys = build.count()
    n_words = bloom.bloom_num_words(n_keys)

    def partial(batch: pa.Table) -> pa.Table:
        keys, valid = _bloom_keys(batch.column(build_on))
        if valid is not None:
            keys = keys[valid]
        bits = bloom.bloom_partial(keys, n_words)
        return pa.table({"bits": pa.FixedSizeListArray.from_arrays(
            pa.array(bits, pa.uint64()), n_words)})

    partials_tbl = dataset_to_table(
        build.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    flat = partials_tbl.column("bits").combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    ).astype(np.uint64)
    if len(flat):
        filt = bloom.bloom_merge(list(flat.reshape(-1, n_words)))
    else:
        filt = np.zeros(n_words, np.uint64)
    return ray.put(filt), n_words


def _bloom_mask(filt, col) -> "pa.Array":
    """Boolean 'might be a build-side member' mask for a probe column;
    null probe keys are definitely-absent (False)."""
    from ..functions import bloom

    keys, valid = _bloom_keys(col)
    m = bloom.bloom_might_contain(filt, keys)
    if valid is not None:
        m &= valid
    return pa.array(m)


def bloom_prefilter(
    probe: ray.data.Dataset,
    build: ray.data.Dataset,
    *,
    probe_on: str,
    build_on: str,
) -> ray.data.Dataset:
    """Drop probe-side rows whose key cannot appear on the build side,
    using a Bloom filter of the build keys (functions/bloom.py). The
    big-side shuffle of a subsequent join then moves survivors only; no
    false negatives, so exact join semantics are preserved by the join
    itself. (Null probe keys are dropped here — they can never satisfy
    a semi/inner join predicate.)"""
    import ray

    filt_ref, _ = _build_bloom_ref(build, build_on)

    def keep(batch: pa.Table) -> pa.Table:
        f = ray.get(filt_ref)
        return batch.filter(_bloom_mask(f, batch.column(probe_on)))

    keep.__name__ = "bloom_prefilter"
    return probe.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def bloom_semi_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    left_on: str,
    right_on: str,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Semi join with a Bloom prefilter on the probe side: identical
    rows to hash_join(how='semi'), but only bloom survivors (true
    matches + ~0.8% false positives) enter the keyed exchange."""
    pruned = bloom_prefilter(left, right, probe_on=left_on, build_on=right_on)
    return hash_join(pruned, right, left_on=left_on, right_on=right_on,
                     how="semi", num_partitions=num_partitions)


def skew_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    left_on: str,
    right_on: str,
    hot_count_threshold: int = 100_000,
    num_partitions: int | None = None,
    materialize: bool = False,
) -> ray.data.Dataset:
    """Skew-aware INNER join: keys whose left-side row count exceeds
    ``hot_count_threshold`` would each flood one partition of the keyed
    exchange (the classic hot-key straggler), so their matches are
    computed MAP-SIDE instead — the right side's hot rows are broadcast
    once (ray.put; bounded: at most n_left/threshold hot keys) and each
    left batch joins its hot rows locally. Cold keys flow through the
    normal hash join with the right side's hot rows filtered out of the
    exchange. Row-identical to hash_join(how='inner'); pytest-proven.

    DETERMINISM CONTRACT: ``left`` feeds three consumers (key counts,
    hot join, cold join) and ``right`` two; neither is pinned by
    default (a fact side materialized at 100 TB is a spill storm), so
    each consumer RE-EXECUTES the input plan. Both plans must therefore
    be deterministic across re-reads — true for every parquet-backed
    pipeline in this repo, but NOT for unseeded sampling or
    time-dependent maps, which would see inconsistent key counts vs
    join inputs (duplicated/dropped rows). For such inputs pass
    ``materialize=True`` to pin one snapshot of each side up front
    (object-store cost: both inputs resident).

    This is the join-shaped sibling of the index build's salted hot-term
    exchange (stages/extract.py): detect heavy keys, give them a
    different physical plan, never a different answer."""
    import numpy as np

    from ..stages.exchange import partitioned_aggregate
    from ..util import dataset_to_table

    if materialize:  # escape hatch for nondeterministic input plans
        left = left.materialize()
        right = right.materialize()

    def key_partials(batch: pa.Table) -> pa.Table:
        out = batch.select([left_on]).group_by([left_on], use_threads=False)\
            .aggregate([(left_on, "count")])
        return out.rename_columns(["k", "c"])

    counts = partitioned_aggregate(
        left.map_batches(key_partials, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["k"], [("c", "sum")], rename={"c_sum": "c"},
    )

    def only_hot(part: pa.Table) -> pa.Table:
        return part.filter(
            pa.compute.greater(part.column("c"), hot_count_threshold)
        ).select(["k"])

    hot_tbl = dataset_to_table(
        counts.map_batches(only_hot, batch_format="pyarrow", zero_copy_batch=True)
    )
    hot_keys = hot_tbl.column("k").combine_chunks()
    if len(hot_keys) == 0:
        return hash_join(left, right, left_on=left_on, right_on=right_on,
                         how="inner", num_partitions=num_partitions)
    hot_ref = ray.put(hot_keys)

    def right_hot(batch: pa.Table) -> pa.Table:
        hk = ray.get(hot_ref)
        return batch.filter(pa.compute.is_in(batch.column(right_on), value_set=hk))

    right_hot_tbl = dataset_to_table(
        right.map_batches(right_hot, batch_format="pyarrow", zero_copy_batch=True)
    )
    rhot_ref = ray.put(right_hot_tbl)

    def left_hot_join(batch: pa.Table) -> pa.Table:
        hk = ray.get(hot_ref)
        lhot = batch.filter(pa.compute.is_in(batch.column(left_on), value_set=hk))
        return lhot.join(
            ray.get(rhot_ref), keys=left_on, right_keys=right_on,
            join_type="inner", right_suffix="_r", use_threads=False,
        )

    def left_cold(batch: pa.Table) -> pa.Table:
        hk = ray.get(hot_ref)
        return batch.filter(
            pa.compute.invert(pa.compute.is_in(batch.column(left_on), value_set=hk))
        )

    def right_cold(batch: pa.Table) -> pa.Table:
        hk = ray.get(hot_ref)
        return batch.filter(
            pa.compute.invert(pa.compute.is_in(batch.column(right_on), value_set=hk))
        )

    hot_out = left.map_batches(left_hot_join, batch_format="pyarrow",
                               zero_copy_batch=True)
    cold_out = hash_join(
        left.map_batches(left_cold, batch_format="pyarrow", zero_copy_batch=True),
        right.map_batches(right_cold, batch_format="pyarrow", zero_copy_batch=True),
        left_on=left_on, right_on=right_on, how="inner",
        num_partitions=num_partitions,
    )
    return hot_out.union(cold_out)


BROADCAST_MAX_ROWS = 2_000_000  # ~the rows of a table worth shipping whole


def broadcast_join(
    left: ray.data.Dataset,
    right_tbl: "pa.Table | ray.data.Dataset",
    *,
    left_on: str,
    right_on: str,
    how: str = "inner",
) -> ray.data.Dataset:
    """Map-side join against a SMALL right side shipped once per worker
    (ray.put) — zero exchanges; every batch joins locally with Arrow's
    C++ kernel. Left-side semantics: inner | left | semi | anti.
    Same output schema as hash_join (right columns suffixed _r)."""
    import ray

    from ..util import dataset_to_table

    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"broadcast_join supports inner|left|semi|anti, got {how!r}")
    if isinstance(right_tbl, ray.data.Dataset):
        right_tbl = dataset_to_table(right_tbl)
    join_type = _JOIN_TYPES[how]
    ref = ray.put(right_tbl.combine_chunks())

    def per_batch(batch: pa.Table) -> pa.Table:
        return batch.join(
            ray.get(ref), keys=left_on, right_keys=right_on,
            join_type=join_type, right_suffix="_r", use_threads=False,
        )

    per_batch.__name__ = f"broadcast_join_{how}"
    return left.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def auto_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    left_on: str,
    right_on: str,
    how: str = "inner",
    right_rows: int | None = None,
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
    num_partitions: int | None = None,
) -> tuple[ray.data.Dataset, str]:
    """Physical-plan picker for the logical join — returns (result,
    plan). Rules, in order:
      1. right side small (<= broadcast_max_rows) and left-side
         semantics -> 'broadcast' (zero exchanges);
      2. semi join with a big right side -> 'bloom' (probe rows that
         cannot match never enter the exchange);
      3. otherwise -> 'hash' (keyed cogroup both sides).
    All plans are row-identical (pytest-proven); pass ``right_rows``
    when the caller already knows the size to skip the count."""
    n_right = right.count() if right_rows is None else right_rows
    if how in ("inner", "left", "semi", "anti") and n_right <= broadcast_max_rows:
        return broadcast_join(left, right, left_on=left_on, right_on=right_on,
                              how=how), "broadcast"
    if how == "semi":
        return bloom_semi_join(left, right, left_on=left_on, right_on=right_on,
                               num_partitions=num_partitions), "bloom"
    return hash_join(left, right, left_on=left_on, right_on=right_on,
                     how=how, num_partitions=num_partitions), "hash"


def bloom_anti_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    left_on: str,
    right_on: str,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Anti join with the Bloom filter used in its SOUND direction for
    anti semantics: a 'definitely absent' probe row is a definite KEEP
    that never enters the keyed exchange; 'possibly present' rows (true
    matches + ~0.8% false positives) go through the exact anti join.
    Row-identical to hash_join(how='anti') — including null-key left
    rows, which are definite keeps on both paths (a null key matches
    nothing, so Arrow's left-anti emits them too)."""
    import pyarrow.compute as pc
    import ray

    filt_ref, _ = _build_bloom_ref(right, right_on)

    def definite_keeps(batch: pa.Table) -> pa.Table:
        f = ray.get(filt_ref)
        return batch.filter(pc.invert(_bloom_mask(f, batch.column(left_on))))

    def possible_members(batch: pa.Table) -> pa.Table:
        f = ray.get(filt_ref)
        return batch.filter(_bloom_mask(f, batch.column(left_on)))

    keeps = left.map_batches(definite_keeps, batch_format="pyarrow",
                             zero_copy_batch=True)
    checked = hash_join(
        left.map_batches(possible_members, batch_format="pyarrow",
                         zero_copy_batch=True),
        right, left_on=left_on, right_on=right_on, how="anti",
        num_partitions=num_partitions,
    )
    return keeps.union(checked)
