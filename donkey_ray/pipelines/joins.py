"""Distributed joins (SURVEY.md B20/B23 wide-op family).

Two shapes, chosen by side size:
  - broadcast join: tiny side shipped once, lookup inside map_batches
    (`pipelines/query.hydrate_results` is the canonical instance);
  - hash join (here): both sides hash-partitioned on the key through the
    keyed cogroup exchange, then Arrow's C++ join kernel runs
    per-partition — equal keys are co-located, so the union of
    per-partition joins IS the global join. Neither side is ever
    materialized whole; per-task state is one partition of each side.

Supported: inner, left outer, left semi, left anti. Right/full outer
would need null-emission for unmatched right rows across partitions —
same exchange, one more cogroup branch — add when needed.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..stages.exchange import keyed_cogroup_map

_JOIN_TYPES = {
    "inner": "inner",
    "left": "left outer",
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

    ``how``: inner | left | semi | anti (left-side semantics). Key
    columns may be named differently; the right key is dropped from the
    output (it equals the left key for matched rows)."""
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
