"""Windowed aggregates over event streams, re-grounded as batch ops
(SURVEY.md 'streaming-only semantics: none' — windows are derived
columns + keyed aggregation, no watermarks needed for bounded data).

Tumbling windows live in driver_api.q_events_window (epoch truncation +
partial-agg exchange). Here: SESSION windows — gap-based sessionization
per key, the classic gaps-and-islands computation — as one keyed
exchange: all of a user's events co-locate, then boundary detection and
segment aggregation are vectorized numpy inside the partition task.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..stages.exchange import keyed_partition_map


def sessionize(
    ds: ray.data.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
    gap_us: int = 30 * 60 * 1_000_000,
) -> ray.data.Dataset:
    """(key, session_start, n_events, sum_value_x100) per session: a new
    session starts when the gap to the key's previous event exceeds
    ``gap_us``. Event order within a key is (ts, order_col) — fully
    deterministic under ties. One keyed exchange; per-partition work is
    vectorized (sort + diff + reduceat)."""

    def per_partition(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {key_col: pa.array([], pa.int64()),
             "session_start": pa.array([], pa.timestamp("us")),
             "n_events": pa.array([], pa.int64()),
             "sum_value_x100": pa.array([], pa.int64())}
        )
        if part.num_rows == 0:
            return empty
        keys = part.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = part.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        order_v = part.column(order_col).to_numpy(zero_copy_only=False)
        vals = part.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        o = np.lexsort((order_v, ts, keys))
        keys, ts, vals = keys[o], ts[o], vals[o]
        new_key = np.empty(len(keys), dtype=bool)
        new_key[0] = True
        new_key[1:] = keys[1:] != keys[:-1]
        gap = np.empty(len(keys), dtype=bool)
        gap[0] = True
        gap[1:] = (ts[1:] - ts[:-1]) > gap_us
        starts = np.flatnonzero(new_key | gap)
        n_ev = np.diff(np.append(starts, len(keys)))
        sums = np.add.reduceat(vals, starts)
        return pa.table(
            {
                key_col: pa.array(keys[starts], pa.int64()),
                "session_start": pa.array(ts[starts], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "n_events": pa.array(n_ev, pa.int64()),
                "sum_value_x100": pa.array(
                    np.round(sums * 100.0).astype(np.int64), pa.int64()
                ),
            }
        )

    return keyed_partition_map(ds, [key_col], per_partition)


def running_total(
    ds: ray.data.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
) -> ray.data.Dataset:
    """Per-key cumulative sum in event-time order — the window-function
    family's running aggregate (SQL: sum(value) OVER (PARTITION BY key
    ORDER BY ts, order_col)). One keyed exchange co-locates each key;
    the per-partition pass is a sort + per-segment cumsum. Emits one row
    per input event: (order_col, key, running_x100). Accumulation order
    is pinned by (ts, order_col); the total is quantized to integer
    cents (x100) because cross-engine float window sums differ in late
    bits (DuckDB evaluates window aggregates over a segment tree)."""

    def per_partition(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {order_col: pa.array([], pa.int64()),
             key_col: pa.array([], pa.int64()),
             "running_x100": pa.array([], pa.int64())}
        )
        if part.num_rows == 0:
            return empty
        keys = part.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = part.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        order_v = part.column(order_col).to_numpy(zero_copy_only=False)
        vals = part.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        o = np.lexsort((order_v, ts, keys))
        keys, order_v, vals = keys[o], order_v[o], vals[o]
        starts = np.concatenate(
            ([0], np.flatnonzero(keys[1:] != keys[:-1]) + 1, [len(keys)])
        )
        # per-segment cumsum (NOT global-cumsum-minus-base: that changes
        # float rounding and breaks bit-reproducibility vs a per-key sum)
        running = np.empty(len(keys), dtype=np.float64)
        for s, e in zip(starts[:-1], starts[1:]):
            running[s:e] = np.cumsum(vals[s:e])
        return pa.table(
            {
                order_col: pa.array(order_v, pa.int64()),
                key_col: pa.array(keys, pa.int64()),
                "running_x100": pa.array(
                    np.round(running * 100.0).astype(np.int64), pa.int64()
                ),
            }
        )

    per_partition.__name__ = "running_total"
    return keyed_partition_map(ds, [key_col], per_partition)
