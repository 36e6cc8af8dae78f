"""Keyed exchange helpers: hash-partitioned local aggregation.

``groupby(key).map_groups(fn)`` in Ray Data emits ONE BLOCK PER GROUP;
with many small groups (terms, shingles, LSH bands) that floods the
pipeline with tiny blocks and per-block overhead dominates. The pattern
here keeps the shuffle but bounds block count:

  map_batches(add __part = stable_hash(key) % P)
    -> groupby('__part').map_groups(partition_fn)   # P blocks total

inside ``partition_fn`` every row of a key is co-located, so a plain
vectorized pyarrow ``Table.group_by`` / sort+run-slice does the per-key
work at C++ speed. P is O(cluster CPUs), independent of group count.

This is also the scale story: P grows with the cluster, per-partition
work stays batched, and skewed keys can be salted upstream (the posting
builder does exactly that).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import ray
import ray.data

_SPLITMIX_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_C2 = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray) -> np.ndarray:
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * _SPLITMIX_C1
    z = (z ^ (z >> np.uint64(27))) * _SPLITMIX_C2
    return z ^ (z >> np.uint64(31))


def _hash_column(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Stable (process-independent) uint64 hash per value. Null keys are
    hashed as a sentinel FOR ROUTING ONLY — a nullable int column would
    otherwise go to numpy through float64 (crashing _mix64 and rounding
    keys above 2^53); the per-partition kernel still sees the original
    nulls, and null join keys match nothing there."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if col.null_count:
        import pyarrow.compute as pc

        if pa.types.is_integer(t):
            col = pc.fill_null(col, 0)
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            col = pc.fill_null(col, "")
        elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
            col = pc.fill_null(col, b"")
    if pa.types.is_integer(t):
        if pa.types.is_unsigned_integer(t):
            return _mix64(col.cast(pa.uint64()).to_numpy(zero_copy_only=False))
        # signed: reinterpret the int64 BIT PATTERN (a value cast to
        # uint64 raises on negative keys); same hash as the value cast
        # for non-negatives, so existing routing is unchanged
        arr = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return _mix64(arr.view(np.uint64))
    import hashlib

    # strings/binary: hash unique values once, then scatter
    enc = col.dictionary_encode()
    dic = enc.dictionary
    vals = np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(
                    v if isinstance(v, bytes) else str(v).encode(),
                    digest_size=8,
                ).digest(),
                "big",
            )
            for v in dic.to_pylist()
        ),
        dtype=np.uint64,
        count=len(dic),
    )
    idx = enc.indices.to_numpy(zero_copy_only=False)
    return vals[idx]


def add_partition_column(
    batch: pa.Table, keys: list[str], num_partitions: int, col: str = "__part"
) -> pa.Table:
    h = np.zeros(batch.num_rows, dtype=np.uint64)
    for k in keys:
        h = _mix64(h ^ _hash_column(batch.column(k)))
    return batch.append_column(
        col, pa.array((h % np.uint64(num_partitions)).astype(np.int32))
    )


def default_num_partitions() -> int:
    # capped: exchange partitions are blocks, and per-block overhead beats
    # extra parallelism beyond ~32 on one node; callers override for scale
    return min(32, max(8, 2 * int(ray.cluster_resources().get("CPU", 4))))


def keyed_partition_map(
    ds: ray.data.Dataset,
    keys: list[str],
    partition_fn: Callable[[pa.Table], pa.Table],
    *,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Hash-partition by ``keys`` then apply ``partition_fn`` to each whole
    partition (the '__part' column is dropped before the call). All rows
    of a key are co-located; group count does not affect block count."""
    P = num_partitions or default_num_partitions()

    def tag(batch: pa.Table) -> pa.Table:
        return add_partition_column(batch, keys, P)

    def run(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        return partition_fn(group)

    run.__name__ = partition_fn.__name__ if hasattr(partition_fn, "__name__") else "partition_fn"
    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("__part").map_groups(run, batch_format="pyarrow")


def keyed_cogroup_map(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_keys: list[str],
    right_keys: list[str],
    cogroup_fn: Callable[[pa.Table, pa.Table], pa.Table],
    *,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Distributed hash cogroup (the repartition-join primitive): both
    sides are hash-partitioned on their key columns through ONE exchange,
    then ``cogroup_fn(left_part, right_part)`` runs once per partition
    with every row of a key value co-located on both sides.

    This is the scale-safe replacement for broadcasting one side as a
    driver-built map: neither side is ever materialized whole; per-task
    state is one partition of each side. Key columns must hash-agree
    across sides (same value -> same partition), which holds because the
    hash is per-value (``_hash_column``) and both sides' key columns are
    combined in order.

    The two sides may have arbitrary (different) schemas; non-key columns
    are padded with nulls on the other side internally and split back
    before ``cogroup_fn`` is called.
    """
    P = num_partitions or default_num_partitions()
    lschema = left.schema()
    rschema = right.schema()
    lnames = list(lschema.names)
    rnames = list(rschema.names)
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    for name in set(lnames) & set(rnames):
        if ltypes[name] != rtypes[name]:
            raise ValueError(
                f"cogroup column {name!r} has conflicting types: "
                f"{ltypes[name]} vs {rtypes[name]}"
            )
    all_fields = [(n, ltypes[n]) for n in lnames]
    all_fields += [(n, rtypes[n]) for n in rnames if n not in ltypes]

    def pad(batch: pa.Table, keys: list[str], side: int) -> pa.Table:
        batch = add_partition_column(batch, keys, P)
        cols = {}
        for name, typ in all_fields:
            if name in batch.column_names:
                cols[name] = batch.column(name)
            else:
                cols[name] = pa.nulls(batch.num_rows, typ)
        cols["__part"] = batch.column("__part")
        cols["__side"] = pa.array(
            np.full(batch.num_rows, side, dtype=np.int8), pa.int8()
        )
        return pa.table(cols)

    def pad_left(batch: pa.Table) -> pa.Table:
        return pad(batch, left_keys, 0)

    def pad_right(batch: pa.Table) -> pa.Table:
        return pad(batch, right_keys, 1)

    lt = left.map_batches(pad_left, batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(pad_right, batch_format="pyarrow", zero_copy_batch=True)

    def run(group: pa.Table) -> pa.Table:
        side = group.column("__side")
        group = group.drop_columns(["__part", "__side"])
        import pyarrow.compute as _pc

        lmask = _pc.equal(side, 0)
        lpart = group.filter(lmask).select(lnames)
        rpart = group.filter(_pc.invert(lmask)).select(rnames)
        return cogroup_fn(lpart, rpart)

    run.__name__ = getattr(cogroup_fn, "__name__", "cogroup_fn")
    return lt.union(rt).groupby("__part").map_groups(run, batch_format="pyarrow")


def partitioned_aggregate(
    ds: ray.data.Dataset,
    keys: list[str],
    aggregations: list[tuple[str, str]],
    *,
    num_partitions: int | None = None,
    rename: dict[str, str] | None = None,
) -> ray.data.Dataset:
    """Distributed group-by built from per-partition pyarrow group_by
    (C++ hash aggregation) — e.g. [('doc_id', 'min'), ('doc_id', 'count')].
    Column names follow pyarrow ('doc_id_min'), optionally renamed."""

    def agg(part: pa.Table) -> pa.Table:
        out = part.group_by(keys, use_threads=False).aggregate(aggregations)
        if rename:
            out = out.rename_columns([rename.get(c, c) for c in out.column_names])
        return out

    agg.__name__ = "partitioned_aggregate"
    return keyed_partition_map(ds, keys, agg, num_partitions=num_partitions)
