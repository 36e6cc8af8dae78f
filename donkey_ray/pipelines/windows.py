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
import pyarrow.compute as pc
import ray.data

from ..stages.exchange import keyed_partition_map


def _round_half_away(x: np.ndarray) -> np.ndarray:
    """DuckDB round() semantics (half AWAY from zero) as int64 —
    np.round is half-to-even and floor(x - 0.5) rounds negatives toward
    -inf; either diverges from the SQL oracles on ties / negatives."""
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


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
                    _round_half_away(sums * 100.0), pa.int64()
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
                    _round_half_away(running * 100.0), pa.int64()
                ),
            }
        )

    per_partition.__name__ = "running_total"
    return keyed_partition_map(ds, [key_col], per_partition)


def funnel_counts(
    ds: ray.data.Dataset,
    steps: list[str],
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> pa.Table:
    """Ordered funnel (sequence analytics): how many keys performed
    step 1, then step 2 STRICTLY after their earliest qualifying step 1,
    then step 3 after that, ... Each step's timestamp is the EARLIEST
    occurrence after the previous step's timestamp (the standard
    earliest-completion funnel; ties on ts do not advance — strict >).

    Scale shape: one keyed exchange co-locates each key's events (only
    rows whose type is in ``steps`` survive the map-side filter); inside
    a partition every step is a vectorized minimum.at over that step's
    rows gated by the previous step's per-key threshold, and only
    len(steps) counter rows leave each partition; the driver sums
    O(partitions x steps) integers. SQL mirror: a chain of
    min(ts)-after-previous CTEs, one count per step."""

    step_list = list(steps)

    def keep_steps(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.is_in(batch.column(type_col),
                     value_set=pa.array(step_list, pa.string()))
        )

    filtered = ds.map_batches(keep_steps, batch_format="pyarrow",
                              zero_copy_batch=True)

    def per_partition(part: pa.Table) -> pa.Table:
        empty = pa.table({"step": pa.array([], pa.int64()),
                          "n_keys": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        keys = part.column(key_col).to_numpy(zero_copy_only=False)
        ts = part.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        types = part.column(type_col).to_numpy(zero_copy_only=False)
        uniq = np.unique(keys)
        uidx = np.searchsorted(uniq, keys)
        prev = np.full(len(uniq), -(2**62), dtype=np.int64)
        counts = np.zeros(len(step_list), dtype=np.int64)
        for i, step in enumerate(step_list):
            cur = np.full(len(uniq), 2**62, dtype=np.int64)
            m = (types == step) & (ts > prev[uidx])
            np.minimum.at(cur, uidx[m], ts[m])
            done = cur < 2**62
            counts[i] = int(done.sum())
            if not done.any():
                break
            cur[~done] = 2**62  # keys that stalled never advance
            prev = cur
        return pa.table({
            "step": pa.array(np.arange(1, len(step_list) + 1), pa.int64()),
            "n_keys": pa.array(counts, pa.int64()),
        })

    per_partition.__name__ = "funnel_steps"
    parts = keyed_partition_map(filtered, [key_col], per_partition)
    from ..util import dataset_to_table

    tbl = dataset_to_table(parts)
    if tbl.num_rows == 0:
        totals = np.zeros(len(step_list), dtype=np.int64)
    else:
        st = tbl.column("step").to_numpy(zero_copy_only=False)
        nk = tbl.column("n_keys").to_numpy(zero_copy_only=False)
        totals = np.zeros(len(step_list), dtype=np.int64)
        np.add.at(totals, st - 1, nk)
    return pa.table({
        "step": pa.array(np.arange(1, len(step_list) + 1), pa.int64()),
        "event_type": pa.array(step_list, pa.string()),
        "n_users": pa.array(totals, pa.int64()),
    })


def session_intervals(
    ds: ray.data.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_us: int = 30 * 60 * 1_000_000,
) -> ray.data.Dataset:
    """(key, lo, hi) per session — the sessionize kernel emitting the
    session's time INTERVAL (first/last event ts) instead of aggregates,
    as the small side of interval_join. Intervals are non-overlapping
    per key by construction (sessions split on > gap_us)."""

    def per_partition(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {key_col: pa.array([], pa.int64()),
             "lo": pa.array([], pa.timestamp("us")),
             "hi": pa.array([], pa.timestamp("us"))}
        )
        if part.num_rows == 0:
            return empty
        keys = part.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = part.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        order_v = part.column(order_col).to_numpy(zero_copy_only=False)
        o = np.lexsort((order_v, ts, keys))
        keys, ts = keys[o], ts[o]
        new_key = np.empty(len(keys), dtype=bool)
        new_key[0] = True
        new_key[1:] = keys[1:] != keys[:-1]
        gap = np.empty(len(keys), dtype=bool)
        gap[0] = True
        gap[1:] = (ts[1:] - ts[:-1]) > gap_us
        starts = np.flatnonzero(new_key | gap)
        ends = np.append(starts[1:], len(keys)) - 1
        return pa.table(
            {
                key_col: pa.array(keys[starts], pa.int64()),
                "lo": pa.array(ts[starts], pa.int64()).cast(pa.timestamp("us")),
                "hi": pa.array(ts[ends], pa.int64()).cast(pa.timestamp("us")),
            }
        )

    return keyed_partition_map(ds, [key_col], per_partition)


def interval_join(
    points: ray.data.Dataset,
    intervals: ray.data.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    lo_col: str = "lo",
    hi_col: str = "hi",
    point_cols: tuple[str, ...] = ("event_id",),
) -> ray.data.Dataset:
    """Keyed interval (range) join: each point row joins the interval of
    the SAME key containing its timestamp (lo <= ts <= hi, inner join).
    Intervals must be non-overlapping per key (true for session windows;
    asserted per partition) so each point has at most one match.

    Distribution: ONE cogroup exchange on the key co-locates each key's
    points and intervals; neither side is broadcast or driver-built.
    The per-partition kernel is fully vectorized across keys — values
    are rank-compressed so (key ordinal, rank) packs into one int64 and
    a single np.searchsorted assigns every point its candidate interval
    (the last interval with (key, lo) <= (key, ts) lexicographically),
    then hi >= ts validates containment."""
    from ..stages.exchange import keyed_cogroup_map

    def cogroup(pts_t: pa.Table, iv_t: pa.Table) -> pa.Table:
        empty = pa.table(
            {**{c: pa.array([], pts_t.schema.field(c).type
                            if c in pts_t.column_names else pa.int64())
                for c in point_cols},
             key_col: pa.array([], pa.int64()),
             ts_col: pa.array([], pa.timestamp("us")),
             lo_col: pa.array([], pa.timestamp("us")),
             hi_col: pa.array([], pa.timestamp("us"))}
        )
        if pts_t.num_rows == 0 or iv_t.num_rows == 0:
            return empty
        ik = iv_t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ilo = iv_t.column(lo_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        ihi = iv_t.column(hi_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        o = np.lexsort((ilo, ik))
        ik, ilo, ihi = ik[o], ilo[o], ihi[o]
        same = ik[1:] == ik[:-1]
        if np.any(same & (ilo[1:] <= ihi[:-1])):
            raise ValueError("interval_join requires non-overlapping "
                             "intervals per key")
        pk = pts_t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        pts = pts_t.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        merged = np.sort(np.concatenate([ilo, pts]))
        ri = np.searchsorted(merged, ilo)
        rp = np.searchsorted(merged, pts)
        uk = np.unique(np.concatenate([ik, pk]))
        M = np.int64(merged.size + 1)
        assert uk.size * M < np.iinfo(np.int64).max, "partition too large"
        ci = np.searchsorted(uk, ik) * M + ri
        cp = np.searchsorted(uk, pk) * M + rp
        cand = np.searchsorted(ci, cp, side="right") - 1
        valid = cand >= 0
        c = np.where(valid, cand, 0)
        valid &= (ik[c] == pk) & (ihi[c] >= pts)
        sel = np.flatnonzero(valid)
        c = cand[sel]
        cols = {}
        for name in point_cols:
            cols[name] = pts_t.column(name).take(pa.array(sel, pa.int64()))
        cols[key_col] = pa.array(pk[sel], pa.int64())
        cols[ts_col] = pa.array(pts[sel], pa.int64()).cast(pa.timestamp("us"))
        cols[lo_col] = pa.array(ilo[c], pa.int64()).cast(pa.timestamp("us"))
        cols[hi_col] = pa.array(ihi[c], pa.int64()).cast(pa.timestamp("us"))
        return pa.table(cols)

    return keyed_cogroup_map(
        points, intervals, [key_col], [key_col], cogroup
    )


WEEK_S = 604_800  # epoch-week bucket (units of 7 days since 1970-01-01)


def cohort_retention(
    ds: ray.data.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Classic cohort-retention matrix over an event stream: users are
    cohorted by their FIRST active epoch-week; for every later week a
    user is active, the (cohort, offset) cell counts them once. Output:
    (cohort_week, offset_weeks, n_users) with week = epoch_seconds //
    604800 as BIGINT (offset 0 row = cohort size).

    Scale shape: per-batch (user, week) dedup caps map output at the
    active-user-week count; ONE user-keyed exchange co-locates each
    user's weeks so the cohort min and the distinct-count contribution
    are both partition-local; the final (cohort, offset) table is tiny
    (weeks^2) and folds through the partial-agg exchange."""
    from ..stages.exchange import partitioned_aggregate

    def user_weeks(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        wk = ts // (WEEK_S * 1_000_000)
        t = pa.table({
            user_col: batch.column(user_col).cast(pa.int64()),
            "wk": pa.array(wk, pa.int64()),
        })
        return t.group_by([user_col, "wk"], use_threads=False).aggregate([])

    def offsets(part: pa.Table) -> pa.Table:
        """All weeks of a user co-locate: dedup (user, wk) globally,
        subtract each user's min week."""
        empty = pa.table({"cohort_week": pa.array([], pa.int64()),
                          "offset_weeks": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        users = part.column(user_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        wks = part.column("wk").to_numpy(zero_copy_only=False)
        o = np.lexsort((wks, users))
        users, wks = users[o], wks[o]
        uniq = np.concatenate(
            ([True], (users[1:] != users[:-1]) | (wks[1:] != wks[:-1])))
        users, wks = users[uniq], wks[uniq]
        starts = np.concatenate(
            ([0], np.flatnonzero(users[1:] != users[:-1]) + 1))
        counts = np.diff(np.concatenate((starts, [len(users)])))
        cohort = np.repeat(wks[starts], counts)
        return pa.table({
            "cohort_week": pa.array(cohort, pa.int64()),
            "offset_weeks": pa.array(wks - cohort, pa.int64()),
        })

    weeks = ds.map_batches(user_weeks, batch_format="pyarrow",
                           zero_copy_batch=True)
    cells = keyed_partition_map(weeks, [user_col], offsets,
                                num_partitions=num_partitions)
    return partitioned_aggregate(
        cells, ["cohort_week", "offset_weeks"],
        [("offset_weeks", "count")],
        num_partitions=num_partitions,
        rename={"offset_weeks_count": "n_users"},
    )


def hourly_anomalies(
    ds: ray.data.Dataset,
    *,
    ts_col: str = "ts",
    type_col: str = "event_type",
    z_x1e6_threshold: int = 2_000_000,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Volume-anomaly detection per event type: hours whose event count
    deviates from the type's mean by more than ``z`` population standard
    deviations (z quantized half-away to x1e6 BIGINT; default threshold
    z=2). Output (event_type, window_start_us, n_events, z_x1e6).

    Hours with zero events are NOT imputed — the series is the observed
    hour buckets only (pinned; the SQL oracle mirrors it). Mean/stddev
    use integer sums (sum, sum of squares) so the per-type moments are
    exact regardless of fold order; population (not sample) variance.

    Scale shape: per-batch (type, hour) pre-count caps map output at the
    active bucket count; ONE type-keyed exchange makes each type's whole
    hour series partition-local (series length is bounded by the time
    range, not the corpus, so a type's series always fits); z-scoring is
    vectorized per partition."""
    from ..stages.exchange import keyed_partition_map, partitioned_aggregate

    HOUR_US = 3_600_000_000

    def bucket_counts(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        hour = (ts // HOUR_US) * HOUR_US
        t = pa.table({
            type_col: batch.column(type_col),
            "window_start_us": pa.array(hour, pa.int64()),
        })
        g = t.group_by([type_col, "window_start_us"],
                       use_threads=False).aggregate(
            [("window_start_us", "count")])
        return pa.table({
            type_col: g.column(type_col),
            "window_start_us": g.column("window_start_us"),
            "n_events": g.column("window_start_us_count").cast(pa.int64()),
        })

    counts = partitioned_aggregate(
        ds.map_batches(bucket_counts, batch_format="pyarrow",
                       zero_copy_batch=True),
        [type_col, "window_start_us"], [("n_events", "sum")],
        num_partitions=num_partitions, rename={"n_events_sum": "n_events"})

    def zscore(part: pa.Table) -> pa.Table:
        empty = pa.table({type_col: pa.array([], pa.string()),
                          "window_start_us": pa.array([], pa.int64()),
                          "n_events": pa.array([], pa.int64()),
                          "z_x1e6": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        order = pc.sort_indices(part, sort_keys=[
            (type_col, "ascending"), ("window_start_us", "ascending")])
        g = part.take(order)
        types = g.column(type_col)
        n = g.column("n_events").to_numpy(zero_copy_only=False)
        enc = (types.combine_chunks() if isinstance(types, pa.ChunkedArray)
               else types).dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = np.bincount(idx).astype(np.float64)
        s1 = np.bincount(idx, weights=n.astype(np.float64))
        s2 = np.bincount(idx, weights=(n.astype(np.float64)) ** 2)
        mean = s1 / cnt
        var = s2 / cnt - mean ** 2
        sd = np.sqrt(np.maximum(var, 0.0))
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(sd[idx] > 0, (n - mean[idx]) / sd[idx], 0.0)
        z6 = _round_half_away(z * 1e6)
        keep = np.abs(z6) >= z_x1e6_threshold
        out = g.append_column("z_x1e6", pa.array(z6, pa.int64()))
        return out.filter(pa.array(keep))

    return keyed_partition_map(counts, [type_col], zscore,
                               num_partitions=num_partitions)


def moving_sum(
    ds: ray.data.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
    preceding: int = 2,
) -> ray.data.Dataset:
    """Per-key ROWS-frame moving sum — the sliding window function
    (SQL: sum(v) OVER (PARTITION BY key ORDER BY ts, order
    ROWS BETWEEN ``preceding`` PRECEDING AND CURRENT ROW)).

    Values are quantized to integer cents BEFORE summation
    (floor(v*100 + 0.5), the repo's pinned half-up rule), so the
    windowed sums are exact integers and can't drift from the oracle no
    matter how either engine associates the frame additions — unlike
    running_total, whose frames are prefixes and can pin a float
    accumulation order, a general frame diff (cumsum[i] - cumsum[i-w])
    would NOT reproduce the oracle's per-frame float rounding.

    One keyed exchange co-locates each key; the per-partition pass is a
    lexsort + integer cumsum diff. Emits (order, key, moving_x100)."""
    w = preceding + 1

    def per_partition(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {order_col: pa.array([], pa.int64()),
             key_col: pa.array([], pa.int64()),
             "moving_x100": pa.array([], pa.int64())}
        )
        if part.num_rows == 0:
            return empty
        keys = part.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = part.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        order_v = part.column(order_col).to_numpy(zero_copy_only=False)
        vals = part.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        cents = np.floor(vals * 100.0 + 0.5).astype(np.int64)
        o = np.lexsort((order_v, ts, keys))
        keys, order_v, cents = keys[o], order_v[o], cents[o]
        seg_starts = np.concatenate(
            ([0], np.flatnonzero(keys[1:] != keys[:-1]) + 1)
        )
        csum = np.concatenate(([0], np.cumsum(cents)))
        idx = np.arange(len(keys))
        seg0 = np.repeat(seg_starts, np.diff(np.concatenate((seg_starts, [len(keys)]))))
        lo = np.maximum(idx - w + 1, seg0)
        moving = csum[idx + 1] - csum[lo]
        return pa.table(
            {
                order_col: pa.array(order_v, pa.int64()),
                key_col: pa.array(keys, pa.int64()),
                "moving_x100": pa.array(moving, pa.int64()),
            }
        )

    per_partition.__name__ = "moving_sum"
    return keyed_partition_map(ds, [key_col], per_partition)


def lag_delta(
    ds: ray.data.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
) -> ray.data.Dataset:
    """Per-key LAG difference — value minus the key's previous value in
    (ts, order) order (SQL: v - LAG(v) OVER (PARTITION BY key ORDER BY
    ts, order)); each key's first row is omitted (LAG is null). Inputs
    are cents-quantized first so the difference is an exact integer.
    One keyed exchange; per-partition lexsort + shifted subtract."""

    def per_partition(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {order_col: pa.array([], pa.int64()),
             key_col: pa.array([], pa.int64()),
             "delta_x100": pa.array([], pa.int64())}
        )
        if part.num_rows == 0:
            return empty
        keys = part.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = part.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        order_v = part.column(order_col).to_numpy(zero_copy_only=False)
        vals = part.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        cents = np.floor(vals * 100.0 + 0.5).astype(np.int64)
        o = np.lexsort((order_v, ts, keys))
        keys, order_v, cents = keys[o], order_v[o], cents[o]
        same_key = np.concatenate(([False], keys[1:] == keys[:-1]))
        delta = np.empty_like(cents)
        delta[1:] = cents[1:] - cents[:-1]
        return pa.table(
            {
                order_col: pa.array(order_v[same_key], pa.int64()),
                key_col: pa.array(keys[same_key], pa.int64()),
                "delta_x100": pa.array(delta[same_key], pa.int64()),
            }
        )

    per_partition.__name__ = "lag_delta"
    return keyed_partition_map(ds, [key_col], per_partition)
