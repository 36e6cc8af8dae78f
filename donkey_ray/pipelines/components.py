"""Connected components over duplicate-pair edges — near-dup CLUSTER
assignment (SURVEY.md training-data ops; the "keep one doc per duplicate
cluster" primitive that pair lists alone don't give you).

``connected_components``: (doc_id, cluster_id, cluster_size) for every
doc that appears in at least one pair, where cluster_id is the smallest
doc_id in the doc's connected component. Deterministic and
order-independent (depends only on the edge set).

Algorithm: distributed contraction (Boruvka-style hooking). Each level
hooks every node to min(node, neighbors) — a keyed exchange over the
edge list — then CONTRACTS the edge list into label space ((lab(u),
lab(v)), self-loops dropped, per-partition distinct) and recurses on the
contracted graph. Near-dup graphs are dense (clusters are near-cliques),
so one hooking level collapses almost everything: the full O(edges) cost
is paid once, and deeper levels shrink geometrically — unlike label
propagation, which re-ships every edge every round until convergence.
When the contracted edge set is empty, each component has collapsed to
its minimum; the per-level (node -> label) mappings are composed from
the deepest level back down (each composition is a keyed join of two
O(nodes-at-level) tables). The component min hooks to itself at every
level, so the composed label is exactly the component-minimum doc_id.

Scale shape: every step is a keyed exchange of O(current edges) or
O(current nodes) rows — never the corpus, and no driver-side or
broadcast whole-graph state. The materialized per-level state (the
contracted edge list and the level's node->label mapping) is the
algorithm's working set, not the input, and shrinks geometrically with
depth. Per-partition work is Arrow C++ (hash join + hash aggregate).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..stages.exchange import (
    default_num_partitions,
    keyed_cogroup_map,
    keyed_partition_map,
)

_OUT_SCHEMA = {
    "doc_id": pa.int64(),
    "cluster_id": pa.int64(),
    "cluster_size": pa.int64(),
}


def _empty_out() -> pa.Table:
    return pa.table({n: pa.array([], t) for n, t in _OUT_SCHEMA.items()})


def _parts_for(n_rows: int, cap: int | None) -> int:
    """Exchange width proportional to the data (4k rows/partition),
    capped at the cluster default — tiny levels run in one task instead
    of paying (and emitting empty sort blocks for) a 32-way exchange."""
    return max(1, min(cap or default_num_partitions(), -(-n_rows // 4096)))


def _hook(edges: ray.data.Dataset, P: int) -> ray.data.Dataset:
    """(node, lab = min(node, neighbors)) from a symmetrized edge list."""

    def init_labels(part: pa.Table) -> pa.Table:
        t = part.group_by(["src"], use_threads=False).aggregate([("dst", "min")])
        lab = pc.min_element_wise(t.column("src"), t.column("dst_min"))
        return pa.table(
            {"node": t.column("src").cast(pa.int64()), "lab": lab.cast(pa.int64())}
        )

    init_labels.__name__ = "cc_hook"
    return keyed_partition_map(edges, ["src"], init_labels, num_partitions=P)


def _relabel(
    edges: ray.data.Dataset,
    labels: ray.data.Dataset,
    col: str,
    out_name: str,
    P: int,
) -> ray.data.Dataset:
    """Replace edge endpoint ``col`` with its label via a cogroup join."""

    def apply(epart: pa.Table, lpart: pa.Table) -> pa.Table:
        if epart.num_rows == 0:
            return pa.table(
                {
                    out_name: pa.array([], pa.int64()),
                    "other": pa.array([], pa.int64()),
                }
            )
        other = "dst" if col == "src" else "src"
        j = epart.join(
            lpart, keys=[col], right_keys=["node"], join_type="inner"
        )
        return pa.table(
            {
                out_name: j.column("lab").cast(pa.int64()),
                "other": j.column(other).cast(pa.int64()),
            }
        )

    apply.__name__ = f"cc_relabel_{col}"
    return keyed_cogroup_map(
        edges, labels, [col], ["node"], apply, num_partitions=P
    )


def connected_components(
    pairs: ray.data.Dataset,
    *,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    num_partitions: int | None = None,
    max_levels: int = 64,
) -> ray.data.Dataset:
    """(doc_id, cluster_id = min doc_id in component, cluster_size) for
    every node of the pair graph. SQL equivalent: transitive closure
    (recursive CTE) + min per node."""

    def local_star(batch: pa.Table) -> pa.Table:
        """Shuffle-free LOCAL contraction: solve the batch's components
        exactly (vectorized min-label + pointer jumping over compressed
        node ids) and emit only the star edges node -> local component
        min. Connectivity-preserving and connectivity-exact for the
        batch, so the global edge set shrinks from O(pairs) to O(unique
        nodes per batch) BEFORE the first exchange — near-dup pair lists
        are massively redundant for connectivity (dense near-cliques)."""
        import numpy as np

        a = batch.column(a_col).combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        b = batch.column(b_col).combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        empty = pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
        if len(a) == 0:
            return empty
        nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        ai, bi = inv[: len(a)], inv[len(a):]
        # Symmetrize and CSR-sort the edge list ONCE; each min-label round
        # is then a gather + minimum.reduceat over the fixed layout. (The
        # naive np.minimum.at scatter is an unbuffered ufunc — ~30x slower
        # per round on multi-million-edge batches.)
        src = np.concatenate([ai, bi])
        dst = np.concatenate([bi, ai])
        order = np.argsort(src, kind="stable")
        src, dst = src[order], dst[order]
        starts = np.concatenate(([0], np.flatnonzero(src[1:] != src[:-1]) + 1))
        snodes = src[starts]
        lab = np.arange(len(nodes), dtype=np.int64)
        while True:
            nl = lab.copy()
            nl[snodes] = np.minimum(
                nl[snodes], np.minimum.reduceat(lab[dst], starts)
            )
            # pointer jumping to FIXPOINT: the label array is O(batch
            # nodes), tiny next to the edge list, so jumping until flat
            # is cheap and collapses label chains — path-shaped batches
            # converge in O(log diameter) outer rounds, not O(diameter)
            while True:
                nj = nl[nl]
                if np.array_equal(nj, nl):
                    break
                nl = nj
            if np.array_equal(nl, lab):
                break
            lab = nl
        m = lab != np.arange(len(nodes))
        return pa.table(
            {
                "src": pa.array(nodes[m], pa.int64()),
                "dst": pa.array(nodes[lab[m]], pa.int64()),
            }
        )

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column("src")
        b = batch.column("dst")
        return pa.concat_tables(
            [pa.table({"src": a, "dst": b}), pa.table({"src": b, "dst": a})]
        )

    edges = (
        pairs.map_batches(
            local_star, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,  # whole blocks: bigger batches = more reduction
        )
        .map_batches(sym, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(_empty_out())

    # ---- contraction levels: hook to min neighbor, shrink the graph ----
    mappings: list[ray.data.Dataset] = []
    for _ in range(max_levels):
        P = _parts_for(n_edges, num_partitions)
        labels = _hook(edges, P).materialize()
        mappings.append(labels)

        # contract both endpoints into label space, drop self-loops,
        # distinct per partition (same pair -> same hash partition)
        half = _relabel(edges, labels, "src", "src", P)

        def flip(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"dst": batch.column("other"), "src_lab": batch.column("src")}
            )

        half = half.map_batches(flip, batch_format="pyarrow", zero_copy_batch=True)

        def apply_dst(epart: pa.Table, lpart: pa.Table) -> pa.Table:
            empty = pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
            )
            if epart.num_rows == 0:
                return empty
            j = epart.join(
                lpart, keys=["dst"], right_keys=["node"], join_type="inner"
            )
            u = j.column("src_lab").cast(pa.int64())
            v = j.column("lab").cast(pa.int64())
            t = pa.table({"src": u, "dst": v}).filter(pc.not_equal(u, v))
            return t.group_by(["src", "dst"], use_threads=False).aggregate([])

        apply_dst.__name__ = "cc_contract"
        edges = keyed_cogroup_map(
            half, labels, ["dst"], ["node"], apply_dst, num_partitions=P
        ).materialize()
        n_edges = edges.count()
        if n_edges == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_levels} levels"
        )

    # ---- compose mappings from the deepest level back down ----
    final = mappings[-1]
    for finer in reversed(mappings[:-1]):
        P = _parts_for(finer.count(), num_partitions)

        def compose(fpart: pa.Table, cpart: pa.Table) -> pa.Table:
            """fpart: this level's (node, lab); cpart: coarser (node ->
            root). Labels absent from the coarser level are isolated
            supernodes — already roots (left outer + coalesce)."""
            if fpart.num_rows == 0:
                return pa.table(
                    {"node": pa.array([], pa.int64()), "lab": pa.array([], pa.int64())}
                )
            c = cpart.rename_columns(["lab", "root"])
            j = fpart.join(c, keys=["lab"], join_type="left outer")
            root = pc.coalesce(j.column("root"), j.column("lab"))
            return pa.table(
                {"node": j.column("node").cast(pa.int64()), "lab": root.cast(pa.int64())}
            )

        compose.__name__ = "cc_compose"
        final = keyed_cogroup_map(
            finer, final, ["lab"], ["node"], compose, num_partitions=P
        ).materialize()

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
        final, ["lab"], attach_size, num_partitions=_parts_for(
            final.count(), num_partitions
        )
    )


def cluster_canonical(
    clusters: ray.data.Dataset,
    quality: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    score_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Canonical-document selection: for every near-dup cluster, the
    member with the best quality score (``score_col`` desc, then
    ``id_col`` asc) — "which copy do we keep for training". Returns
    (cluster_id, canonical_doc_id, <score_col>, cluster_size).

    Two keyed exchanges, both over projections: a cogroup join attaches
    each member's quality score (neither side is broadcast or
    materialized — cluster count is unbounded at corpus scale), then a
    hash exchange on cluster_id co-locates members for a vectorized
    argmax (sort + first-of-run slice). SQL mirror: row_number() OVER
    (PARTITION BY cluster_id ORDER BY score DESC, doc_id) = 1."""
    from ..stages.exchange import keyed_cogroup_map, keyed_partition_map

    def attach(cpart: pa.Table, qpart: pa.Table) -> pa.Table:
        if cpart.num_rows == 0:
            return pa.table(
                {
                    cluster_col: pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    score_col: pa.array([], pa.int64()),
                    "cluster_size": pa.array([], pa.int64()),
                }
            )
        j = cpart.join(
            qpart.select([id_col, score_col]), keys=[id_col], join_type="inner"
        )
        return pa.table(
            {
                cluster_col: j.column(cluster_col).cast(pa.int64()),
                id_col: j.column(id_col).cast(pa.int64()),
                score_col: j.column(score_col).cast(pa.int64()),
                "cluster_size": j.column("cluster_size").cast(pa.int64()),
            }
        )

    attach.__name__ = "canonical_attach_quality"
    scored = keyed_cogroup_map(
        clusters, quality.select_columns([id_col, score_col]),
        [id_col], [id_col], attach, num_partitions=num_partitions,
    )

    def argmax(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                cluster_col: pa.array([], pa.int64()),
                "canonical_doc_id": pa.array([], pa.int64()),
                score_col: pa.array([], pa.int64()),
                "cluster_size": pa.array([], pa.int64()),
            }
        )
        if part.num_rows == 0:
            return empty
        import numpy as np

        srt = part.sort_by(
            [(cluster_col, "ascending"), (score_col, "descending"),
             (id_col, "ascending")]
        )
        c = srt.column(cluster_col).to_numpy(zero_copy_only=False)
        first = np.concatenate(([True], c[1:] != c[:-1]))
        head = srt.filter(pa.array(first))
        return pa.table(
            {
                cluster_col: head.column(cluster_col),
                "canonical_doc_id": head.column(id_col),
                score_col: head.column(score_col),
                "cluster_size": head.column("cluster_size"),
            }
        )

    argmax.__name__ = "canonical_argmax"
    return keyed_partition_map(
        scored, [cluster_col], argmax, num_partitions=num_partitions
    )
