"""Connected components over duplicate-pair edges — near-dup CLUSTER
assignment (SURVEY.md training-data ops; the "keep one doc per duplicate
cluster" primitive that pair lists alone don't give you).

``connected_components``: (doc_id, cluster_id, cluster_size) for every
doc that appears in at least one pair, where cluster_id is the smallest
doc_id in the doc's connected component. Deterministic and
order-independent (depends only on the edge set).

Algorithm: distributed min-label propagation. Labels start as
min(node, neighbors) and each iteration propagates the current label one
hop (cogroup join of edges with labels, then per-node min); labels are
monotonically nonincreasing, so the fixpoint — no label changed — is
exact. Iterations needed = the longest hop distance from a component's
minimum to any member; near-dup clusters are shallow (dups of dups), so
this converges in a handful of rounds. A ``max_iters`` cap guards
pathological chains.

Scale shape: per iteration exactly two keyed exchanges (edges⋈labels
cogroup, then per-node min), each O(edges) rows — never the corpus, and
no driver-side or broadcast whole-graph state. The only materialized
state is the O(nodes) label table and the O(edges) symmetrized edge
list, both of which every iteration re-reads (the iterative-algorithm
exception to streaming; they are the algorithm's working set, not the
input). Per-partition work is Arrow C++ (hash join + hash aggregate).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..stages.exchange import keyed_cogroup_map, keyed_partition_map

_OUT_SCHEMA = {
    "doc_id": pa.int64(),
    "cluster_id": pa.int64(),
    "cluster_size": pa.int64(),
}


def _empty_out() -> pa.Table:
    return pa.table({n: pa.array([], t) for n, t in _OUT_SCHEMA.items()})


def connected_components(
    pairs: ray.data.Dataset,
    *,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    num_partitions: int | None = None,
    max_iters: int = 64,
) -> ray.data.Dataset:
    """(doc_id, cluster_id = min doc_id in component, cluster_size) for
    every node of the pair graph. SQL equivalent: transitive closure
    (recursive CTE) + min per node."""

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col).cast(pa.int64())
        b = batch.column(b_col).cast(pa.int64())
        return pa.concat_tables(
            [pa.table({"src": a, "dst": b}), pa.table({"src": b, "dst": a})]
        )

    # the iteration's working set: O(edges), re-read every round
    edges = pairs.map_batches(
        sym, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(_empty_out())

    def init_labels(part: pa.Table) -> pa.Table:
        t = part.group_by(["src"], use_threads=False).aggregate([("dst", "min")])
        lab = pc.min_element_wise(t.column("src"), t.column("dst_min"))
        return pa.table(
            {"node": t.column("src").cast(pa.int64()), "lab": lab.cast(pa.int64())}
        )

    init_labels.__name__ = "cc_init"
    labels = keyed_partition_map(
        edges, ["src"], init_labels, num_partitions=num_partitions
    ).materialize()

    def propagate(lpart: pa.Table, epart: pa.Table) -> pa.Table:
        """lpart: labels keyed by node; epart: edges keyed by src (same
        hash partition). Emit the node's own label (own=1) plus the label
        pushed across each out-edge (own=0)."""
        own = pa.table(
            {
                "node": lpart.column("node").cast(pa.int64()),
                "lab": lpart.column("lab").cast(pa.int64()),
                "own": pa.array(np.ones(lpart.num_rows, dtype=np.int8)),
            }
        )
        if epart.num_rows == 0:
            return own
        j = epart.join(
            lpart.select(["node", "lab"]),
            keys=["src"], right_keys=["node"], join_type="inner",
        )
        pushed = pa.table(
            {
                "node": j.column("dst").cast(pa.int64()),
                "lab": j.column("lab").cast(pa.int64()),
                "own": pa.array(np.zeros(j.num_rows, dtype=np.int8)),
            }
        )
        return pa.concat_tables([own, pushed])

    def minimize(part: pa.Table) -> pa.Table:
        """Per node: new label = min of all candidates; changed vs the
        node's own (previous) label drives convergence."""
        t = part.group_by(["node"], use_threads=False).aggregate([("lab", "min")])
        prev = part.filter(pc.equal(part.column("own"), 1)).select(["node", "lab"])
        j = prev.join(t, keys=["node"], join_type="inner")
        return pa.table(
            {
                "node": j.column("node").cast(pa.int64()),
                "lab": j.column("lab_min").cast(pa.int64()),
                "changed": pc.less(j.column("lab_min"), j.column("lab"))
                .cast(pa.int8()),
            }
        )

    minimize.__name__ = "cc_minimize"
    for _ in range(max_iters):
        cand = keyed_cogroup_map(
            labels.map_batches(
                lambda b: b.select(["node", "lab"]),
                batch_format="pyarrow", zero_copy_batch=True,
            ),
            edges,
            ["node"], ["src"],
            propagate,
            num_partitions=num_partitions,
        )
        labels = keyed_partition_map(
            cand, ["node"], minimize, num_partitions=num_partitions
        ).materialize()
        if labels.sum("changed") == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} iterations"
        )

    def attach_size(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _empty_out()
        cnt = part.group_by(["lab"], use_threads=False).aggregate(
            [("node", "count")]
        )
        j = part.select(["node", "lab"]).join(cnt, keys=["lab"], join_type="inner")
        return pa.table(
            {
                "doc_id": j.column("node").cast(pa.int64()),
                "cluster_id": j.column("lab").cast(pa.int64()),
                "cluster_size": j.column("node_count").cast(pa.int64()),
            }
        )

    attach_size.__name__ = "cc_sizes"
    return keyed_partition_map(
        labels, ["lab"], attach_size, num_partitions=num_partitions
    )
