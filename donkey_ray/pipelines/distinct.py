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
from ..stages.exchange import keyed_partition_map, partitioned_aggregate
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


def approx_quantiles_per_group(
    ds: ray.data.Dataset,
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    bins: int = 256,
    qs: tuple[float, ...] = (0.5, 0.95),
) -> ray.data.Dataset:
    """Mergeable histogram-sketch quantiles per group — the third member
    of the sketch family (HLL distinct, Misra-Gries heavy hitters, this).

    Unlike exact per-group quantiles (q_events_quantiles), raw values
    NEVER shuffle: pass 1 is an O(groups) min/max/count aggregate,
    pass 2 ships only (group, bucket) count partials (<= groups x bins
    rows per batch). The sketch spec is INTEGER-EXACT so both engines
    (and a SQL oracle) compute the identical sketch:
      cents  = floor(v * 100 + 0.5)                 (pinned quantize)
      width  = max(1, ceil((max - min + 1) / bins)) (integer ceil)
      bucket = (cents - min) // width
      answer for q = upper cent bound of the FIRST bucket whose
      cumulative count >= ceil(q * n)  ->  approx_x100 =
      min + (bucket + 1) * width - 1, clamped to the group max.
    Guaranteed error <= width cents; pytest gates it against exact
    numpy quantiles."""

    def cents_of(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {group_col: batch.column(group_col),
             "c": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64), pa.int64())}
        )

    # pinned once: both the bounds pass and the bucket pass consume it —
    # without the materialize the source read + quantize map run twice
    cents = ds.map_batches(
        cents_of, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    bounds_tbl = dataset_to_table(
        partitioned_aggregate(
            cents, [group_col], [("c", "min"), ("c", "max"), ("c", "count")],
            rename={"c_min": "cmin", "c_max": "cmax", "c_count": "n"},
        )
    )
    groups = bounds_tbl.column(group_col).to_pylist()
    cmin = dict(zip(groups, bounds_tbl.column("cmin").to_pylist()))
    cmax = dict(zip(groups, bounds_tbl.column("cmax").to_pylist()))
    nrow = dict(zip(groups, bounds_tbl.column("n").to_pylist()))
    # ceil over POSITIVE operands only: DuckDB's // truncates toward
    # zero while numpy floors, so the two agree only on non-negatives
    width = {g: (cmax[g] - cmin[g] + 1 + bins - 1) // bins or 1 for g in groups}
    bounds_ref = ray.put((cmin, width))

    def bucket_partials(batch: pa.Table) -> pa.Table:
        lo, w = ray.get(bounds_ref)
        gs = batch.column(group_col)
        if isinstance(gs, pa.ChunkedArray):
            gs = gs.combine_chunks()
        enc = gs.dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        c = batch.column("c").to_numpy(zero_copy_only=False)
        lo_v = np.array([lo[u] for u in uniq], dtype=np.int64)[idx]
        w_v = np.array([w[u] for u in uniq], dtype=np.int64)[idx]
        b = (c - lo_v) // w_v
        t = pa.table({group_col: gs, "bucket": pa.array(b, pa.int64())})
        out = t.group_by([group_col, "bucket"], use_threads=False).aggregate(
            [("bucket", "count")]
        )
        return out.rename_columns([group_col, "bucket", "cnt"])

    counts = partitioned_aggregate(
        cents.map_batches(bucket_partials, batch_format="pyarrow",
                          zero_copy_batch=True),
        [group_col, "bucket"], [("cnt", "sum")], rename={"cnt_sum": "cnt"},
    )
    meta_ref = ray.put((cmin, cmax, nrow, width, tuple(qs)))

    def pick(part: pa.Table) -> pa.Table:
        """Per group (all its buckets co-located): cumulative counts ->
        first bucket at each target rank."""
        empty = pa.table({group_col: pa.array([], pa.string()),
                          "q_permille": pa.array([], pa.int64()),
                          "approx_x100": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        lo, hi, n_of, w, qlist = ray.get(meta_ref)
        srt = part.sort_by([(group_col, "ascending"), ("bucket", "ascending")])
        gs = srt.column(group_col).to_pylist()
        bk = srt.column("bucket").to_numpy(zero_copy_only=False)
        ct = srt.column("cnt").to_numpy(zero_copy_only=False)
        out_g, out_q, out_v = [], [], []
        i = 0
        while i < len(gs):
            j = i
            while j < len(gs) and gs[j] == gs[i]:
                j += 1
            g = gs[i]
            cum = np.cumsum(ct[i:j])
            for q in qlist:
                qp = int(round(q * 1000))
                target = (qp * n_of[g] + 999) // 1000  # ceil(q*n), positive ops
                k = int(np.searchsorted(cum, target))
                val = lo[g] + (int(bk[i + k]) + 1) * w[g] - 1
                out_g.append(g)
                out_q.append(qp)
                out_v.append(min(val, hi[g]))
            i = j
        return pa.table({group_col: pa.array(out_g, pa.string()),
                         "q_permille": pa.array(out_q, pa.int64()),
                         "approx_x100": pa.array(out_v, pa.int64())})

    pick.__name__ = "approx_quantiles"
    return keyed_partition_map(counts, [group_col], pick)
