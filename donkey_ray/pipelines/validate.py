"""Data-quality validation — expectation checks with per-rule violation
counts (the pre-ingest gate of a training-data pipeline).

Every rule is a per-batch vectorized predicate whose violation count
folds through a partial-sum exchange, except uniqueness, which needs a
key-distinct count: only the (key) projection shuffles (map-side batch
dedup first), mirroring pipelines/distinct.py. Output is one row per
rule: (rule, n_violations) — O(rules), never O(rows), leaves the
cluster.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..stages.exchange import partitioned_aggregate
from ..util import dataset_to_table


def validate_events(
    ds: ray.data.Dataset,
    *,
    allowed_types: tuple[str, ...] = ("view", "click", "purchase", "error", "signup"),
) -> ray.data.Dataset:
    """Pinned rule set for the events table:
      value_nonnegative   value < 0 (nulls pass)
      ts_not_null         ts IS NULL
      type_known          event_type not in ``allowed_types`` (or null)
      event_id_unique     n_rows - n_distinct(event_id)
    """
    allowed = pa.array(list(allowed_types), pa.string())

    def partials(batch: pa.Table) -> pa.Table:
        v = batch.column("value")
        neg = pc.sum(
            pc.fill_null(pc.less(v, 0.0), False).cast(pa.int64())
        ).as_py() or 0
        ts_null = batch.column("ts").null_count
        et = batch.column("event_type")
        known = pc.fill_null(pc.is_in(et, value_set=allowed), False)
        unknown = batch.num_rows - (pc.sum(known.cast(pa.int64())).as_py() or 0)
        return pa.table(
            {"rule": pa.array(
                ["value_nonnegative", "ts_not_null", "type_known"], pa.string()),
             "n": pa.array([neg, ts_null, unknown], pa.int64())}
        )

    rule_counts = dataset_to_table(
        partitioned_aggregate(
            ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True),
            ["rule"], [("n", "sum")], rename={"n_sum": "n_violations"},
        )
    )

    # uniqueness violations = n_rows - n_distinct(event_id) = the sum of
    # (occurrences - 1) per id; shuffle only batch-precounted (id, c)
    # partials, never the rows
    def id_counts(batch: pa.Table) -> pa.Table:
        out = batch.select(["event_id"]).group_by(
            ["event_id"], use_threads=False
        ).aggregate([("event_id", "count")])
        return out.rename_columns(["event_id", "c"])

    occ = partitioned_aggregate(
        ds.map_batches(id_counts, batch_format="pyarrow", zero_copy_batch=True),
        ["event_id"], [("c", "sum")], rename={"c_sum": "c"},
    )

    def excess(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"x": pa.array([int((c - 1).sum())], pa.int64())})

    n_dups = int(pa.compute.sum(
        dataset_to_table(
            occ.map_batches(excess, batch_format="pyarrow", zero_copy_batch=True)
        ).column("x")
    ).as_py() or 0)

    out = pa.table(
        {"rule": pa.array(
            list(rule_counts.column("rule").to_pylist()) + ["event_id_unique"],
            pa.string()),
         "n_violations": pa.array(
             list(rule_counts.column("n_violations").to_pylist()) + [n_dups],
             pa.int64())}
    )
    return ray.data.from_arrow(out)
