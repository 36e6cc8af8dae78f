"""Distributed graph analytics over pair graphs (training-data ops).

PageRank over the near-dup pair graph: ranks every document by its
centrality in the duplicate/similarity graph — a curation signal
(high-rank nodes are template/boilerplate hubs; Lee et al. 2022 observe
near-dup clusters concentrate around such hubs).

Integer-exact spec (pinned so a SQL oracle can mirror it bit-for-bit —
float PageRank sums are order-dependent across engines):
  - ranks are int64 parts-per-trillion (SCALE = 10^12)
  - r0(v)      = SCALE // N                      for every node
  - contrib(u) = r(u) // out_deg(u)              to each out-neighbor
  - r'(v)      = TELE + (85 * incoming(v)) // 100
    with TELE  = (15 * SCALE) // (100 * N)       (damping d = 0.85)
  - dangling mass is dropped (nodes without out-edges contribute
    nothing); isolated nodes keep TELE — both pinned choices the oracle
    mirrors exactly.
All arithmetic is non-negative int64 (85 * incoming <= 85 * SCALE fits
comfortably), so every sum is order-independent and the distributed
fold can't drift from the oracle.

Scale shape: per iteration ONE rank->edge cogroup exchange (emit
per-partition pre-summed contributions), one keyed partial-sum
exchange, and one nodes-left-join exchange — all linear in |edges| and
|nodes|; no broadcast, no driver-side state. The rank table
(2 int64 columns) is materialized per iteration into the (spillable)
object store — the standard iterative-algorithm working set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..stages.exchange import (
    keyed_cogroup_map,
    keyed_partition_map,
    partitioned_aggregate,
)
from ..util import dataset_to_table

SCALE = 10**12
DAMP_NUM, DAMP_DEN = 85, 100

# driver-local fast-path gates (the graph analogue of dedup's dense
# dispatch): below these sizes the whole job is a few numpy passes and
# per-iteration Ray round-trips dominate wall time; above them the
# distributed broadcast/exchange paths run unchanged
_LOCAL_MAX_EDGES = 4_000_000
_LOCAL_MAX_WEDGES = 8_000_000


def _checked_lookup(sorted_arr: np.ndarray, keys: np.ndarray, what: str) -> np.ndarray:
    """searchsorted with a membership check: a pair endpoint absent from
    the node universe must raise, not silently credit its rank mass to
    the lexicographically-next node (e.g. when `nodes` was filtered to
    survivors but `pairs` still references a removed doc)."""
    if len(sorted_arr) == 0:
        if len(keys):
            raise KeyError(
                f"pagerank: {what} references node ids missing from `nodes` "
                f"(e.g. {np.asarray(keys)[:3].tolist()}) — pass the full "
                "node universe")
        return np.zeros(0, dtype=np.int64)
    pos = np.searchsorted(sorted_arr, keys)
    ok = pos < len(sorted_arr)
    np.minimum(pos, len(sorted_arr) - 1, out=pos)
    ok &= sorted_arr[pos] == keys
    if not ok.all():
        missing = np.asarray(keys)[~ok][:3].tolist()
        raise KeyError(
            f"pagerank: {what} references node ids missing from `nodes` "
            f"(e.g. {missing}) — pass the full node universe")
    return pos


def _closed_wedge_count(src: np.ndarray, dst: np.ndarray, dd: np.ndarray,
                        keys: np.ndarray) -> int:
    """Count wedges (per-src out-neighbor pairs in (deg, id) order) that
    close against the sorted packed oriented-edge key set. Shared by the
    distributed wedge_close kernel and the driver-local small-graph
    path."""
    if len(src) == 0:
        return 0
    o = np.lexsort((dst, dd, src))
    src, dst = src[o], dst[o]
    starts = np.concatenate(([0], np.flatnonzero(src[1:] != src[:-1]) + 1))
    ends = np.concatenate((starts[1:], [len(src)]))
    total = 0
    for s, e in zip(starts, ends):
        run = dst[s:e]
        if e - s < 2:
            continue
        ai, bi = np.triu_indices(e - s, k=1)
        wk = run[ai] * (1 << 32) + run[bi]
        pos = np.searchsorted(keys, wk)
        total += int(((pos < len(keys))
                      & (keys[np.minimum(pos, len(keys) - 1)] == wk)).sum())
    return total


def _edges_bidirected(pairs: ray.data.Dataset, a_col: str, b_col: str) -> ray.data.Dataset:
    """Undirected pair rows -> both directed edges (src, dst)."""

    def bidir(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"src": pa.array(np.concatenate((a, b)), pa.int64()),
             "dst": pa.array(np.concatenate((b, a)), pa.int64())}
        )

    return pairs.map_batches(bidir, batch_format="pyarrow", zero_copy_batch=True)


def pagerank(
    nodes: ray.data.Dataset,
    pairs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    iterations: int = 10,
    mode: str = "broadcast",
) -> ray.data.Dataset:
    """(doc_id, rank_ppt) after ``iterations`` integer-exact power steps
    over the bidirected pair graph. ``nodes`` is the full node universe
    (isolated docs included — they hold the teleport rank).

    ``mode='broadcast'`` (default): the rank vector (16 B/node) ships
    once per iteration via ray.put and the edge table — materialized
    once — is never re-exchanged; per iteration the only shuffle is the
    pre-summed (dst, contrib) partials. Right up to ~10^8 nodes this is
    strictly cheaper than re-hashing |edges| rows every round.
    ``mode='exchange'``: fully keyed cogroup iterations, per-task memory
    independent of node count — the unbounded-nodes scale path (same
    output, pytest-proven)."""
    if mode not in ("broadcast", "exchange"):
        raise ValueError(f"mode must be broadcast|exchange, got {mode!r}")
    # pin both inputs once: .count() would otherwise execute the (possibly
    # expensive — e.g. a dedup pair pipeline) upstream graph a second time
    # when the datasets are consumed below
    nodes = nodes.materialize()
    pairs = pairs.materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "rank_ppt": pa.array([], pa.int64())})
        )
    tele = (15 * SCALE) // (100 * n_nodes)
    r0 = SCALE // n_nodes
    n_pairs = pairs.count()

    if mode == "broadcast" and 0 < 2 * n_pairs <= _LOCAL_MAX_EDGES:
        # small-graph short circuit: the broadcast plan's driver already
        # holds the rank vector AND merges every iteration's partials, so
        # below the edge gate the whole 10-iteration job is pure numpy —
        # per-iteration Ray round-trips would dominate. Identical pinned
        # integer arithmetic; pytest holds it to the exchange mode.
        ptbl = dataset_to_table(pairs.select_columns([a_col, b_col]))
        a = ptbl.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = ptbl.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate((a, b))
        dst = np.concatenate((b, a))
        ntbl = dataset_to_table(nodes.select_columns([id_col]))
        node_arr = np.sort(
            ntbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64))
        spos = _checked_lookup(node_arr, src, "an edge src")
        dpos = _checked_lookup(node_arr, dst, "an edge dst")
        deg = np.bincount(spos, minlength=len(node_arr)).astype(np.int64)
        r_vec = np.full(len(node_arr), r0, dtype=np.int64)
        for _ in range(iterations):
            per_edge = r_vec[spos] // deg[spos]
            inc_vec = np.zeros(len(node_arr), dtype=np.int64)
            np.add.at(inc_vec, dpos, per_edge)
            r_vec = tele + (DAMP_NUM * inc_vec) // DAMP_DEN
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array(node_arr, pa.int64()),
                      "rank_ppt": pa.array(r_vec, pa.int64())})
        )

    if n_pairs == 0:
        # no edges: after >= 1 iteration every node holds pure teleport
        # mass (with 0 iterations the initial uniform rank)
        rank = tele if iterations >= 1 else r0

        def iso(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"doc_id": batch.column(id_col).cast(pa.int64()),
                 "rank_ppt": pa.array(
                     np.full(batch.num_rows, rank, np.int64))}
            )

        return nodes.map_batches(iso, batch_format="pyarrow", zero_copy_batch=True)

    edges = _edges_bidirected(pairs, a_col, b_col)
    deg = partitioned_aggregate(
        edges, ["src"], [("dst", "count")], rename={"dst_count": "deg"}
    )

    def attach_deg(ep: pa.Table, dp: pa.Table) -> pa.Table:
        empty = pa.table({"src": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64()),
                          "deg": pa.array([], pa.int64())})
        if ep.num_rows == 0:
            return empty
        src = ep.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        dsrc = dp.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        dv = dp.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(dsrc)
        pos = np.searchsorted(dsrc[o], src)
        return pa.table(
            {"src": ep.column("src"), "dst": ep.column("dst"),
             "deg": pa.array(dv[o][pos], pa.int64())}
        )

    # deg is attached once and the (src, dst, deg) edge table is pinned in
    # the object store — every iteration re-reads it without recompute
    edges_deg = keyed_cogroup_map(edges, deg, ["src"], ["src"], attach_deg).materialize()

    def node_ids(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column(id_col).cast(pa.int64()),
                         "r": pa.array(np.full(batch.num_rows, r0, np.int64))})

    ranks = nodes.map_batches(
        node_ids, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    node_universe = ranks.select_columns(["node"]).materialize()

    if mode == "broadcast":
        import ray as _ray

        rank_tbl = dataset_to_table(ranks)
        node_arr = np.sort(
            rank_tbl.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        r_vec = np.full(len(node_arr), r0, dtype=np.int64)
        # node_arr is static — ship it to the object store ONCE; only
        # the changing rank vector is re-put per iteration
        node_ref = _ray.put(node_arr)
        for _ in range(iterations):
            ref = _ray.put(r_vec)

            def contribs_b(batch: pa.Table) -> pa.Table:
                na, rv = _ray.get(node_ref), _ray.get(ref)
                src = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
                deg_v = batch.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
                per_edge = rv[_checked_lookup(na, src, "an edge src")] // deg_v
                t = pa.table({"dst": batch.column("dst"),
                              "c": pa.array(per_edge, pa.int64())})
                return t.group_by(["dst"], use_threads=False).aggregate(
                    [("c", "sum")]
                ).rename_columns(["dst", "c"])

            # per-batch (dst, c) pre-aggregates merge DRIVER-SIDE into the
            # O(nodes) incoming vector — in the broadcast regime that
            # vector already lives on the driver, so a keyed exchange of
            # the partials would only add a round of shuffle latency
            part_tbl = dataset_to_table(
                edges_deg.map_batches(contribs_b, batch_format="pyarrow",
                                      zero_copy_batch=True)
            )
            inc_vec = np.zeros(len(node_arr), dtype=np.int64)
            if part_tbl.num_rows:
                dst = part_tbl.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
                c = part_tbl.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
                np.add.at(inc_vec, _checked_lookup(node_arr, dst, "an edge dst"), c)
            # zero incoming -> tele + 0, identical to the oracle's COALESCE
            r_vec = tele + (DAMP_NUM * inc_vec) // DAMP_DEN
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array(node_arr, pa.int64()),
                      "rank_ppt": pa.array(r_vec, pa.int64())})
        )

    for _ in range(iterations):
        def contribs(rp: pa.Table, ep: pa.Table) -> pa.Table:
            """Partition-local: rank gather onto edges + pre-sum by dst
            (the map-side combine before the keyed sum exchange)."""
            empty = pa.table({"dst": pa.array([], pa.int64()),
                              "c": pa.array([], pa.int64())})
            if ep.num_rows == 0:
                return empty
            rn = rp.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
            rv = rp.column("r").to_numpy(zero_copy_only=False).astype(np.int64)
            o = np.argsort(rn)
            src = ep.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
            pos = _checked_lookup(rn[o], src, "an edge src")
            deg_v = ep.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
            per_edge = rv[o][pos] // deg_v
            t = pa.table({"dst": ep.column("dst"),
                          "c": pa.array(per_edge, pa.int64())})
            return t.group_by(["dst"], use_threads=False).aggregate(
                [("c", "sum")]
            ).rename_columns(["dst", "c"])

        incoming = partitioned_aggregate(
            keyed_cogroup_map(ranks, edges_deg, ["node"], ["src"], contribs),
            ["dst"], [("c", "sum")], rename={"c_sum": "inc"},
        )

        def apply_rank(np_: pa.Table, ip: pa.Table) -> pa.Table:
            nodes_v = np_.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
            r_new = np.full(len(nodes_v), tele, dtype=np.int64)
            if ip.num_rows:
                dst = ip.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
                inc = ip.column("inc").to_numpy(zero_copy_only=False).astype(np.int64)
                o = np.argsort(nodes_v)
                pos = _checked_lookup(nodes_v[o], dst, "an edge dst")
                r_new[o[pos]] = tele + (DAMP_NUM * inc) // DAMP_DEN
            return pa.table({"node": pa.array(nodes_v, pa.int64()),
                             "r": pa.array(r_new, pa.int64())})

        ranks = keyed_cogroup_map(
            node_universe, incoming, ["node"], ["dst"], apply_rank
        ).materialize()

    def out(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("node"),
                         "rank_ppt": batch.column("r")})

    return ranks.map_batches(out, batch_format="pyarrow", zero_copy_batch=True)


def pagerank_oracle_sql(
    edge_cte: str, *, iterations: int = 10,
    nodes_sql: str = "SELECT doc_id FROM documents",
    prelude: list[str] | None = None,
) -> str:
    """The unrolled-CTE DuckDB mirror of ``pagerank`` (aggregation inside
    a recursive CTE term is not portable SQL, so the fixed iteration
    count is unrolled). ``edge_cte`` must select undirected pair columns
    (da, db); ``prelude`` CTE definitions (e.g. the shingle/pair CTEs it
    references) are inserted first."""
    tele = f"(SELECT (15 * {SCALE}) // (100 * n) FROM params)"
    ctes = [
        *(prelude or []),
        f"g_nodes AS ({nodes_sql})",
        "params AS (SELECT count(*) AS n FROM g_nodes)",
        f"g_pairs AS ({edge_cte})",
        "g_e AS (SELECT da AS src, db AS dst FROM g_pairs UNION ALL SELECT db, da FROM g_pairs)",
        "g_deg AS (SELECT src, count(*) AS deg FROM g_e GROUP BY 1)",
        f"pr0 AS (SELECT doc_id, (SELECT {SCALE} // n FROM params) AS r FROM g_nodes)",
    ]
    for k in range(1, iterations + 1):
        ctes.append(
            f"""pr{k} AS (
  SELECT n.doc_id,
         {tele} + ({DAMP_NUM} * COALESCE(inc.s, 0)) // {DAMP_DEN} AS r
  FROM g_nodes n LEFT JOIN (
    SELECT e.dst AS doc_id, sum(p.r // d.deg)::BIGINT AS s
    FROM pr{k - 1} p JOIN g_e e ON e.src = p.doc_id JOIN g_deg d ON d.src = e.src
    GROUP BY 1) inc ON inc.doc_id = n.doc_id
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT doc_id, r AS rank_ppt FROM pr{iterations}"
    )


def triangle_count(
    pairs: ray.data.Dataset, *, a_col: str = "doc_a", b_col: str = "doc_b",
    mode: str = "broadcast",
) -> ray.data.Dataset:
    """One-row (n_triangles) count over the undirected pair graph.

    Degree-oriented wedges (the skew-safe plan): every edge is
    oriented from its (degree, id)-smaller endpoint, so out-degree is
    bounded by ~sqrt(2|E|) even at near-clique hubs and wedge generation
    cannot blow up on a hot node. Each triangle closes exactly one wedge
    at its smallest-(degree, id) corner. The count is orientation-
    independent, so the SQL oracle may use plain id ordering.

    ``mode='broadcast'`` (default): the oriented edge KEY SET (8 B/edge,
    sorted packed int64) ships once via ray.put and wedges are tested
    map-side inside the same per-src partition task that generates them
    — wedges never shuffle (they outnumber edges ~deg/2-fold). Right up
    to ~10^9 edges. ``mode='exchange'``: wedges co-locate with closing
    edges through a keyed cogroup — per-task memory independent of |E|.
    Same count, pytest-proven."""
    if mode not in ("broadcast", "exchange"):
        raise ValueError(f"mode must be broadcast|exchange, got {mode!r}")
    # pin once: .count() plus the consumption below would otherwise run
    # the upstream pair pipeline twice
    pairs = pairs.materialize()
    if pairs.count() == 0:
        return ray.data.from_arrow(
            pa.table({"n_triangles": pa.array([0], pa.int64())})
        )

    def eid(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # validate here (the one pass every exchange-mode row takes):
        # the partition-local guard in `close` can miss an out-of-range
        # id whose wedges all land in clean partitions
        if len(a) and (max(int(a.max()), int(b.max())) >= (1 << 31)
                       or min(int(a.min()), int(b.min())) < 0):
            raise ValueError(
                "triangle_count packs (src, dst) into one int64; node ids "
                "must be in [0, 2^31) — remap ids first")
        return pa.table(
            {"u": pa.array(np.concatenate((a, b)), pa.int64()),
             "v": pa.array(np.concatenate((b, a)), pa.int64())}
        )

    both = pairs.map_batches(eid, batch_format="pyarrow", zero_copy_batch=True)
    deg = partitioned_aggregate(
        both, ["u"], [("v", "count")], rename={"v_count": "deg"}
    )

    def attach_u(ep: pa.Table, dp: pa.Table) -> pa.Table:
        empty = pa.table({"u": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64()),
                          "du": pa.array([], pa.int64())})
        if ep.num_rows == 0:
            return empty
        un = dp.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        dv = dp.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(un)
        u = ep.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"u": ep.column("u"), "v": ep.column("v"),
                         "du": pa.array(dv[o][np.searchsorted(un[o], u)], pa.int64())})

    with_du = keyed_cogroup_map(both, deg, ["u"], ["u"], attach_u)

    def attach_v_orient(ep: pa.Table, dp: pa.Table) -> pa.Table:
        """Attach deg(v), then keep only the (deg, id)-increasing
        orientation of each edge: src -> dst with (d_src, src) <
        (d_dst, dst)."""
        empty = pa.table({"src": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64()),
                          "dd": pa.array([], pa.int64())})
        if ep.num_rows == 0:
            return empty
        vn = dp.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        dv = dp.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(vn)
        v = ep.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        u = ep.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        du = ep.column("du").to_numpy(zero_copy_only=False).astype(np.int64)
        dvv = dv[o][np.searchsorted(vn[o], v)]
        keep = (du < dvv) | ((du == dvv) & (u < v))
        return pa.table({"src": pa.array(u[keep], pa.int64()),
                         "dst": pa.array(v[keep], pa.int64()),
                         "dd": pa.array(dvv[keep], pa.int64())})

    oriented = keyed_cogroup_map(with_du, deg, ["v"], ["u"], attach_v_orient)

    def wedges(part: pa.Table) -> pa.Table:
        """Per src (all its oriented out-edges co-located): every
        out-neighbor pair, ordered by the SAME (deg, id) key so the
        wedge (x, y) aligns with the oriented closing edge x -> y."""
        empty = pa.table({"wa": pa.array([], pa.int64()),
                          "wb": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        src = part.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        dst = part.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        dd = part.column("dd").to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((dst, dd, src))
        src, dst = src[o], dst[o]
        starts = np.concatenate(([0], np.flatnonzero(src[1:] != src[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(src)]))
        a_out, b_out = [], []
        for s, e in zip(starts, ends):
            run = dst[s:e]  # already (deg, id)-ascending
            if e - s < 2:
                continue
            ai, bi = np.triu_indices(e - s, k=1)
            a_out.append(run[ai])
            b_out.append(run[bi])
        if not a_out:
            return empty
        t = pa.table({"wa": pa.array(np.concatenate(a_out), pa.int64()),
                      "wb": pa.array(np.concatenate(b_out), pa.int64())})
        cnt = t.group_by(["wa", "wb"], use_threads=False).aggregate([("wa", "count")])
        return cnt.rename_columns(["wa", "wb", "n"])

    if mode == "broadcast":
        import ray as _ray

        # the whole O(E) prologue (degrees, orientation, closure keys)
        # is one numpy pass over the driver-side edge table — the same
        # |E|-fits-the-driver budget the closure broadcast already
        # assumes; only the O(sum C(deg,2)) wedge work is distributed
        ptbl = dataset_to_table(pairs.select_columns([a_col, b_col]))
        a = ptbl.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = ptbl.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # drop self-loops (a == b): the exchange path's orientation rule
        # already excludes them — keeping them here manufactured wedges
        # through the oriented self edge, diverging from exchange mode
        loop_free = a != b
        if not loop_free.all():
            a, b = a[loop_free], b[loop_free]
        if len(a) and (max(int(a.max()), int(b.max())) >= (1 << 31)
                       or min(int(a.min()), int(b.min())) < 0):
            raise ValueError(
                "triangle_count packs (src, dst) into one int64; node ids "
                "must be in [0, 2^31) — remap ids first")
        uniq, inv = np.unique(np.concatenate((a, b)), return_inverse=True)
        degv = np.bincount(inv, minlength=len(uniq))
        da, db = degv[inv[: len(a)]], degv[inv[len(a):]]
        a_first = (da < db) | ((da == db) & (a < b))
        es = np.where(a_first, a, b)
        ed = np.where(a_first, b, a)
        dd_v = np.where(a_first, db, da)
        keys_arr = np.sort(es * (1 << 32) + ed)

        # small-graph short circuit: the driver already holds the whole
        # oriented edge table; when the wedge count (sum C(outdeg, 2)) is
        # bounded, the one exchange + task fan-out costs more than the
        # numpy pass itself
        out_cnt = np.unique(es, return_counts=True)[1]
        if int((out_cnt * (out_cnt - 1) // 2).sum()) <= _LOCAL_MAX_WEDGES:
            total = _closed_wedge_count(es, ed, dd_v, keys_arr)
            return ray.data.from_arrow(
                pa.table({"n_triangles": pa.array([total], pa.int64())})
            )

        keys_ref = _ray.put(keys_arr)
        oriented = ray.data.from_arrow(pa.table(
            {"src": pa.array(es, pa.int64()), "dst": pa.array(ed, pa.int64()),
             "dd": pa.array(dd_v, pa.int64())}
        ))

        def wedge_close(part: pa.Table) -> pa.Table:
            """Generate this src partition's wedges AND close them against
            the broadcast oriented-edge key set — wedges never leave the
            task."""
            if part.num_rows == 0:
                return pa.table({"t": pa.array([0], pa.int64())})
            keys = _ray.get(keys_ref)
            src = part.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
            dst = part.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
            dd = part.column("dd").to_numpy(zero_copy_only=False).astype(np.int64)
            total = _closed_wedge_count(src, dst, dd, keys)
            return pa.table({"t": pa.array([total], pa.int64())})

        wedge_close.__name__ = "triangle_wedge_close"
        tot = dataset_to_table(keyed_partition_map(oriented, ["src"], wedge_close))
        total = int(pa.compute.sum(tot.column("t")).as_py() or 0)
        return ray.data.from_arrow(
            pa.table({"n_triangles": pa.array([total], pa.int64())})
        )

    w = keyed_partition_map(oriented, ["src"], wedges)

    def close(wp: pa.Table, ep: pa.Table) -> pa.Table:
        """Wedge (wa, wb) closes iff the oriented edge wa -> wb exists."""
        if wp.num_rows == 0 or ep.num_rows == 0:
            return pa.table({"t": pa.array([0], pa.int64())})
        es = ep.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        ed = ep.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        wa = wp.column("wa").to_numpy(zero_copy_only=False).astype(np.int64)
        wb = wp.column("wb").to_numpy(zero_copy_only=False).astype(np.int64)
        n = wp.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        hi = max(int(es.max()), int(ed.max()), int(wa.max()), int(wb.max()))
        lo = min(int(es.min()), int(ed.min()), int(wa.min()), int(wb.min()))
        if hi >= (1 << 31) or lo < 0:
            raise ValueError(
                "triangle_count packs (src, dst) into one int64; node ids "
                f"must be in [0, 2^31), got [{lo}, {hi}] — remap ids first")
        keys = np.sort(es * (1 << 32) + ed)
        wk = wa * (1 << 32) + wb
        pos = np.searchsorted(keys, wk)
        hit = (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)] == wk)
        return pa.table({"t": pa.array([int(n[hit].sum())], pa.int64())})

    parts = keyed_cogroup_map(w, oriented, ["wa", "wb"], ["src", "dst"], close)
    tot = dataset_to_table(parts)
    total = int(pa.compute.sum(tot.column("t")).as_py() or 0)
    return ray.data.from_arrow(
        pa.table({"n_triangles": pa.array([total], pa.int64())})
    )


def degree_histogram(
    pairs: ray.data.Dataset, *, a_col: str = "doc_a", b_col: str = "doc_b",
) -> ray.data.Dataset:
    """(degree, n_nodes) rows over the undirected pair graph — the
    duplicate-hub size profile (how many docs have 1, 2, ... near-dups).

    Scale shape: two chained partial-agg exchanges, both on projected
    int columns only — (node -> degree) via map-side pre-count, then
    (degree -> node count); the output is at most max-degree rows and
    isolated docs never appear (they have no pair rows)."""
    deg = partitioned_aggregate(
        _edges_bidirected(pairs, a_col, b_col).select_columns(["src"]),
        ["src"], [("src", "count")], rename={"src_count": "degree"},
    )
    hist = partitioned_aggregate(
        deg.select_columns(["degree"]),
        ["degree"], [("degree", "count")], rename={"degree_count": "n_nodes"},
    )
    return hist
