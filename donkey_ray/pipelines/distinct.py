"""Distinct counting: exact (keyed exchange) and approximate (HLL).

Exact: per-batch dedup map-side (cuts shuffle volume to distinct pairs
per batch), then one keyed exchange on the group column and Arrow's
count_distinct per co-located partition.

Approximate: HyperLogLog register vectors as map-side partials —
each batch emits one (group, registers) row; registers merge by
elementwise max, so the final reduce is tiny and exact-mergeable no
matter how batches were split (functions/sketch.py). This is the
sketch shape to use when even the distinct pairs are too many to
shuffle (10^12-row groups).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.sketch import hll_estimate, hll_merge, hll_partial
from ..stages.exchange import keyed_partition_map
from ..util import dataset_to_table


def exact_distinct_per_group(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    value_col: str,
    out_col: str = "n_distinct",
) -> ray.data.Dataset:
    def batch_dedup(batch: pa.Table) -> pa.Table:
        return batch.group_by([group_col, value_col], use_threads=False).aggregate([])

    dd = ds.map_batches(batch_dedup, batch_format="pyarrow", zero_copy_batch=True)

    def count_distinct(part: pa.Table) -> pa.Table:
        out = part.group_by([group_col], use_threads=False).aggregate(
            [(value_col, "count_distinct")]
        )
        return out.rename_columns([group_col, out_col])

    count_distinct.__name__ = "count_distinct"
    return keyed_partition_map(dd, [group_col], count_distinct)


def approx_distinct_per_group(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    value_col: str,
    p: int = 12,
) -> pa.Table:
    """(group, n_distinct_approx) via mergeable HLL partials: one small
    (group, 2^p-byte registers) row per (batch, group); the driver merge
    is O(groups * 2^p) regardless of row count."""

    def partials(batch: pa.Table) -> pa.Table:
        keys = batch.column(group_col).to_numpy(zero_copy_only=False)
        vals = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        out_k, out_r = [], []
        for k in np.unique(keys):
            out_k.append(str(k))
            out_r.append(hll_partial(vals[keys == k], p=p).tobytes())
        return pa.table(
            {group_col: pa.array(out_k, pa.string()),
             "regs": pa.array(out_r, pa.binary())}
        )

    tbl = dataset_to_table(
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    )
    merged: dict[str, np.ndarray] = {}
    for k, r in zip(tbl.column(group_col).to_pylist(), tbl.column("regs").to_pylist()):
        regs = np.frombuffer(r, dtype=np.uint8)
        merged[k] = hll_merge(merged[k], regs) if k in merged else regs
    keys = sorted(merged)
    return pa.table(
        {
            group_col: pa.array(keys, pa.string()),
            "n_distinct_approx": pa.array(
                [hll_estimate(merged[k]) for k in keys], pa.float64()
            ),
        }
    )
