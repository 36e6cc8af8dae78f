"""IVF-PQ (IVFADC) ANN index — Jégou, Douze & Schmid 2011 §IV, pinned
integer spec end to end.

THE billion-scale ANN serving composition (FAISS's IVFADC default, the
shape donkey's kgraph fleet would migrate to at RAM-bound corpus sizes,
SURVEY.md §2A A4/A5): a COARSE quantizer (pinned-int k-means,
pipelines/kmeans.py spec) buckets vectors into inverted lists, each
vector stores only its M-byte PQ code of the RESIDUAL x - coarse(x),
and a query probes the ``nprobe`` nearest lists, scoring candidates by
Asymmetric Distance Computation against per-(query, probed list)
residual distance tables. Memory per vector = M codes + a list id (vs
D floats); query I/O = the probed lists only.

Everything reuses the pinned-integer arithmetic of kmeans.py / pq.py so
a DuckDB oracle mirrors training, encoding, probe selection AND search
bit-for-bit:

* inputs quantize half-up x1e6 (int64);
* coarse = kmeans_fit (smallest-vec_id init, exact-int argmin with
  smallest-c ties, floor-div updates, empty-cluster carry);
* residual r = q(x) - coarse_centroid[assigned] — exact int64;
* PQ codebooks train on residuals with the pq.py fused-Lloyd shape
  (init = the K globally-smallest vec_ids' residual sub-vectors);
* probe rule: the nprobe lists with smallest exact-int
  ||q - centroid||^2, ties toward the smaller list id;
* ADC distance = sum_m ||(q - coarse[list])_m - book_m[code]||^2,
  exact int64 (residuals ~2e6/dim, 64 dims -> ~3e14, far inside int64).

Scale shape:
* training: kmeans_fit + a fused residual-PQ Lloyd — every pass reduces
  batches to O(K*D) integer partials; the corpus never shuffles.
* build: encode is a shuffle-free map (coarse + books ride in the
  closure, O((n_lists + M*K) * D) ints); the ONE exchange is the
  list->partition groupby; segments are (list_id, vec_id)-sorted with
  atomic rename + checksum manifests, so retries and resumes redo only
  missing partitions (same treatment as the text/IVF/PQ indexes).
* serving: a query reads only the partitions owning its probed lists,
  row-group-pruned on the sorted list_id column; per-batch work is M
  table lookups per candidate code plus a local top-k, and only
  O(blocks * k) rows reach the driver merge. The distance tables are
  (nq * nprobe * M * K) ints — closure-sized, never a broadcast of
  vector data.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..state import manifest as mf
from ..util import dataset_to_table
from .ann import _batch_matrix
from .kmeans import KM_SCALE, _assign_ids, _quantize, kmeans_fit

IVFPQ_FORMAT_VERSION = 1
IVFPQ_NLISTS = 4   # coarse lists
IVFPQ_CITERS = 2   # coarse Lloyd iterations
IVFPQ_M = 4        # PQ subspaces (on residuals)
IVFPQ_K = 8        # codes per subspace
IVFPQ_RITERS = 2   # residual-PQ Lloyd iterations
IVFPQ_NPROBE = 2   # default probed lists


def _sub_slices(dim: int, m: int) -> list[tuple[int, int]]:
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by {m} subspaces")
    w = dim // m
    return [(s * w, (s + 1) * w) for s in range(m)]


def _resid_rows(batch: pa.Table, cn: np.ndarray, vec_col: str,
                id_col: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(ids, lists 0-based, residual int64 matrix) for one batch."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    q = _quantize(_batch_matrix(batch, vec_col))
    lists = _assign_ids(q, cn)
    return ids, lists, q - cn[lists]


def ivfpq_train(
    ds: ray.data.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int = IVFPQ_NLISTS,
    c_iters: int = IVFPQ_CITERS,
    m: int = IVFPQ_M,
    k: int = IVFPQ_K,
    r_iters: int = IVFPQ_RITERS,
) -> tuple[list[list[int]], list[list[list[int]]]]:
    """Fit (coarse centroids, residual PQ codebooks), both Python-int
    x1e6. Coarse = the pinned kmeans_fit; the residual PQ runs the
    fused-Lloyd shape of pq.pq_train with residual computation inline
    (residuals are already exact ints — re-quantizing them through the
    float x1e6 path would corrupt them, hence no pq_train reuse)."""
    coarse = kmeans_fit(ds, vec_col=vec_col, id_col=id_col, k=n_lists,
                        iterations=c_iters)
    cn = np.asarray(coarse, dtype=np.int64)
    dim = cn.shape[1]
    slices = _sub_slices(dim, m)

    # --- init: the k globally-smallest vec_ids' residual sub-vectors ---
    def initial(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "vid": pa.array([], pa.int64()),
            "rv": pa.array([], pa.list_(pa.int64())),
        })
        if batch.num_rows == 0:
            return empty
        ids, _, r = _resid_rows(batch, cn, vec_col, id_col)
        take = np.argsort(ids, kind="stable")[:k]
        return pa.table({
            "vid": pa.array(ids[take], pa.int64()),
            "rv": pa.array(list(r[take]), pa.list_(pa.int64())),
        })

    part = dataset_to_table(
        ds.map_batches(initial, batch_format="pyarrow", zero_copy_batch=True)
    )
    if part.num_rows < k:
        raise ValueError(f"ivfpq_train needs >= {k} rows, got {part.num_rows}")
    vids = np.asarray(part.column("vid").to_pylist(), dtype=np.int64)
    order = np.argsort(vids, kind="stable")[:k]
    rvs = part.column("rv").to_pylist()
    full = [[int(x) for x in rvs[i]] for i in order]
    books: list[list[list[int]]] = [
        [row[lo:hi] for row in full] for lo, hi in slices
    ]

    # --- fused Lloyd over residuals: one pass covers all subspaces ---
    for _ in range(r_iters):
        bn = [np.asarray(b, dtype=np.int64) for b in books]

        def partials(batch: pa.Table, bn=bn) -> pa.Table:
            empty = pa.table({
                "sub": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.list_(pa.int64())),
            })
            if batch.num_rows == 0:
                return empty
            _, _, r = _resid_rows(batch, cn, vec_col, id_col)
            subs, cs, ns, ss = [], [], [], []
            for si, (lo, hi) in enumerate(slices):
                rm = r[:, lo:hi]
                assign = _assign_ids(rm, bn[si])
                counts = np.bincount(assign, minlength=k)
                sums = np.zeros((k, hi - lo), dtype=np.int64)
                np.add.at(sums, assign, rm)
                keep = counts > 0
                idx = np.arange(k, dtype=np.int64)[keep]
                subs.append(np.full(idx.size, si, dtype=np.int64))
                cs.append(idx)
                ns.append(counts[keep].astype(np.int64))
                ss.extend(list(sums[keep]))
            return pa.table({
                "sub": pa.array(np.concatenate(subs)),
                "c": pa.array(np.concatenate(cs)),
                "n": pa.array(np.concatenate(ns)),
                "s": pa.array(ss, pa.list_(pa.int64())),
            })

        tbl = dataset_to_table(
            ds.map_batches(partials, batch_format="pyarrow",
                           zero_copy_batch=True)
        )
        # unbounded Python-int fold (same rationale as kmeans_fit)
        n_by = [[0] * k for _ in range(m)]
        s_by = [[[0] * (hi - lo) for _ in range(k)] for lo, hi in slices]
        for sub, c, n, s in zip(tbl.column("sub").to_pylist(),
                                tbl.column("c").to_pylist(),
                                tbl.column("n").to_pylist(),
                                tbl.column("s").to_pylist()):
            n_by[sub][c] += n
            row = s_by[sub][c]
            for i, v in enumerate(s):
                row[i] += v
        books = [
            [
                [s_by[si][c][i] // n_by[si][c] for i in range(hi - lo)]
                if n_by[si][c] > 0 else books[si][c]
                for c in range(k)
            ]
            for si, (lo, hi) in enumerate(slices)
        ]
    return coarse, books


def ivfpq_encode(
    ds: ray.data.Dataset,
    coarse: list[list[int]],
    books: list[list[list[int]]],
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """(vec_id, list_id 1-based, codes list<int64> 1-based). Pure map —
    coarse + books ride in the closure (O((n_lists + M*K) * D) ints)."""
    cn = np.asarray(coarse, dtype=np.int64)
    bn = [np.asarray(b, dtype=np.int64) for b in books]
    slices = _sub_slices(cn.shape[1], len(bn))

    def encode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "list_id": pa.array([], pa.int32()),
                "codes": pa.array([], pa.list_(pa.int64())),
            })
        ids, lists, r = _resid_rows(batch, cn, vec_col, id_col)
        cols = [
            _assign_ids(r[:, lo:hi], bn[si]) + 1
            for si, (lo, hi) in enumerate(slices)
        ]
        codes = np.stack(cols, axis=1).astype(np.int64)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "list_id": pa.array((lists + 1).astype(np.int32), pa.int32()),
            "codes": pa.array(list(codes), pa.list_(pa.int64())),
        })

    return ds.map_batches(encode, batch_format="pyarrow",
                          zero_copy_batch=True)


class _IVFPQPartWriter(mf.PartitionSegmentWriter):
    """One partition's (list_id, vec_id, codes) rows -> sorted segment
    parquet + manifest entry (shared atomic/resumable writer)."""

    def __init__(self, out_dir: str) -> None:
        super().__init__(
            out_dir, part_col="part",
            sort_keys=[("list_id", "ascending"), ("vec_id", "ascending")],
            count_field="n_vecs", row_group_size=1024,
            name="IVFPQPartWriter")


def build_ivfpq_index(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int = IVFPQ_NLISTS,
    c_iters: int = IVFPQ_CITERS,
    m: int = IVFPQ_M,
    k: int = IVFPQ_K,
    r_iters: int = IVFPQ_RITERS,
    num_partitions: int = 4,
) -> dict:
    """Build (or resume) the persisted IVFADC artifact:

      out/coarse.json                  coarse centroids + PQ codebooks
      out/segments/part-%05d.parquet   (list_id, vec_id, codes), sorted
                                       by (list_id, vec_id); partition =
                                       (list_id - 1) % num_partitions
      out/manifest/part-%05d.json      per-partition lineage
      out/index_meta.json, out/_SUCCESS

    Raw vectors never persist: the serving fleet holds list ids + M
    codes per vector. A crashed build resumes at partition granularity
    (finished partitions are checksum-validated and skipped; the rows
    destined to them are filtered out BEFORE the exchange)."""
    if mf.is_complete(out_dir):
        return mf.load_meta(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    model_path = os.path.join(out_dir, "coarse.json")
    if os.path.exists(model_path):
        import json
        with open(model_path) as f:
            model = json.load(f)
        coarse, books = model["coarse"], model["books"]
    else:
        coarse, books = ivfpq_train(
            ds, vec_col=vec_col, id_col=id_col, n_lists=n_lists,
            c_iters=c_iters, m=m, k=k, r_iters=r_iters,
        )
        mf.atomic_write_json(model_path, {
            "n_lists": n_lists, "c_iters": c_iters, "m": m, "k": k,
            "r_iters": r_iters, "coarse": coarse, "books": books,
        })

    done = mf.validated_done_parts(out_dir, num_partitions)
    skipped = sorted(done)
    if len(done) < num_partitions:
        done_arr = np.array(sorted(done), dtype=np.int32)

        def add_part(batch: pa.Table) -> pa.Table:
            lists = batch.column("list_id").to_numpy(zero_copy_only=False)
            part = ((lists - 1) % num_partitions).astype(np.int32)
            out = batch.append_column("part", pa.array(part, pa.int32()))
            if len(done_arr):
                out = out.filter(pa.array(~np.isin(part, done_arr)))
            return out

        rows = (
            ivfpq_encode(ds, coarse, books, vec_col=vec_col, id_col=id_col)
            .map_batches(add_part, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("part")
            .map_groups(_IVFPQPartWriter(out_dir), batch_format="pyarrow")
        )
        new_entries = {int(r["part"]): r for r in rows.take_all()}
    else:
        new_entries = {}

    all_entries = {**done, **new_entries}
    meta = {
        "format_version": IVFPQ_FORMAT_VERSION,
        "kind": "ivfpq",
        "n_lists": n_lists,
        "c_iters": c_iters,
        "m": m,
        "k": k,
        "r_iters": r_iters,
        "dim": len(coarse[0]),
        "num_partitions": num_partitions,
        "n_vecs": int(sum(e["n_vecs"] for e in all_entries.values())),
        "parts_built": sorted(int(p) for p in all_entries),
        "parts_skipped_on_resume": skipped,
        "id_col": id_col,
    }
    mf.write_meta(out_dir, meta)
    mf.mark_complete(out_dir)
    return meta


def load_ivfpq_model(out_dir: str) -> tuple[list[list[int]],
                                            list[list[list[int]]]]:
    import json

    with open(os.path.join(out_dir, "coarse.json")) as f:
        model = json.load(f)
    return model["coarse"], model["books"]


def ivfpq_topk(
    out_dir: str,
    query_vectors: np.ndarray,
    *,
    k: int = 10,
    nprobe: int | None = IVFPQ_NPROBE,
) -> pa.Table:
    """IVFADC top-k: probe the nprobe nearest coarse lists per query
    (exact-int distance, ties to the smaller list id), ADC-score only
    the code rows of probed lists, exact int64 distances throughout.
    Returns (query_id, rank, vec_id, dist), ties (dist asc, vec_id asc).

    Reads ONLY the partitions owning probed lists; within them the
    per-batch mask drops non-probed lists (row groups are list-sorted,
    so parquet stats prune most of the skip). The (nq, nprobe, M, K)
    distance-table tensor rides via ray.put — no vector data ships."""
    meta = mf.load_meta(out_dir)
    if not mf.is_complete(out_dir):
        raise FileNotFoundError(f"IVFPQ index at {out_dir} is not complete")
    coarse, books = load_ivfpq_model(out_dir)
    cn = np.asarray(coarse, dtype=np.int64)
    bn = [np.asarray(b, dtype=np.int64) for b in books]
    m = len(bn)
    kk_codes = bn[0].shape[0]
    dim = cn.shape[1]
    slices = _sub_slices(dim, m)
    n_lists = cn.shape[0]
    nprobe = n_lists if nprobe is None else min(nprobe, n_lists)

    qm = np.floor(np.asarray(query_vectors, dtype=np.float64)
                  * KM_SCALE + 0.5).astype(np.int64)
    nq = qm.shape[0]
    # probe selection: exact ||q - c||^2, ties toward the smaller list
    diff = qm[:, None, :] - cn[None, :, :]
    cd = np.einsum("qld,qld->ql", diff, diff)
    list_ids = np.arange(n_lists, dtype=np.int64)
    probe = np.stack([
        np.lexsort((list_ids, cd[qi]))[:nprobe] for qi in range(nq)
    ])  # (nq, nprobe) of 0-based lists

    # dtab[qi, slot, si, code] = ||(q - coarse[list])_sub - book||^2
    dtab = np.zeros((nq, nprobe, m, kk_codes), dtype=np.int64)
    for qi in range(nq):
        for slot in range(nprobe):
            r = qm[qi] - cn[probe[qi, slot]]
            for si, (lo, hi) in enumerate(slices):
                d = r[lo:hi][None, :] - bn[si]
                dtab[qi, slot, si, :] = np.einsum("cd,cd->c", d, d)
    # slot_of[qi, list] = probe slot or -1
    slot_of = np.full((nq, n_lists), -1, dtype=np.int64)
    for qi in range(nq):
        slot_of[qi, probe[qi]] = np.arange(nprobe)
    ship = ray.put((dtab, slot_of))

    probed_lists_1b = np.unique(probe) + 1
    parts = np.unique((probed_lists_1b - 1) % meta["num_partitions"])
    # a partition whose every coarse list is EMPTY legitimately has no
    # segment file (groupby only yields existing groups) — consult the
    # meta's parts_built ledger instead of demanding a file per probed
    # partition, and only then treat absence as corruption
    built = set(int(p) for p in meta.get("parts_built", []))
    paths = [mf.segment_path(out_dir, int(p)) for p in parts if int(p) in built]
    missing = [p for p in paths if not os.path.exists(p)]
    if missing:
        raise FileNotFoundError(
            f"IVFPQ index {out_dir} is missing {len(missing)} built "
            f"segment(s): {missing[:3]}"
        )
    if not paths:
        return pa.table({
            "query_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int32()),
            "vec_id": pa.array([], pa.int64()),
            "dist": pa.array([], pa.int64()),
        })

    subs = np.arange(m)

    def local_topk(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "query_id": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "dist": pa.array([], pa.int64()),
        })
        if batch.num_rows == 0:
            return empty
        dt, so = ray.get(ship)
        lists0 = batch.column("list_id").to_numpy(
            zero_copy_only=False).astype(np.int64) - 1
        ids = batch.column("vec_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        codes_col = batch.column("codes")
        if isinstance(codes_col, pa.ChunkedArray):
            codes_col = codes_col.combine_chunks()
        flat = np.asarray(codes_col.flatten().to_numpy(
            zero_copy_only=False), dtype=np.int64)
        codes = flat.reshape(len(ids), m) - 1
        out_q, out_id, out_d = [], [], []
        for qi in range(nq):
            slots = so[qi][lists0]
            sel = slots >= 0
            if not sel.any():
                continue
            tabs = dt[qi, slots[sel]]  # (nsel, m, K)
            d = tabs[
                np.arange(tabs.shape[0])[:, None], subs[None, :], codes[sel]
            ].sum(axis=1)
            ids_q = ids[sel]
            kk = min(k, len(ids_q))
            idx = np.lexsort((ids_q, d))[:kk]
            out_q.extend([qi] * len(idx))
            out_id.extend(ids_q[idx].tolist())
            out_d.extend(d[idx].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_id, pa.int64()),
            "dist": pa.array(out_d, pa.int64()),
        })

    tbl = dataset_to_table(
        ray.data.read_parquet(paths)
        .map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    )
    qids = tbl.column("query_id").to_numpy(zero_copy_only=False)
    vids = tbl.column("vec_id").to_numpy(zero_copy_only=False)
    dists = tbl.column("dist").to_numpy(zero_copy_only=False)
    out = {"query_id": [], "rank": [], "vec_id": [], "dist": []}
    for qi in range(nq):
        sel = qids == qi
        ids_q, d_q = vids[sel], dists[sel]
        idx = np.lexsort((ids_q, d_q))[:k]
        for r, j in enumerate(idx, start=1):
            out["query_id"].append(qi)
            out["rank"].append(r)
            out["vec_id"].append(int(ids_q[j]))
            out["dist"].append(int(d_q[j]))
    return pa.table({
        "query_id": pa.array(out["query_id"], pa.int64()),
        "rank": pa.array(out["rank"], pa.int32()),
        "vec_id": pa.array(out["vec_id"], pa.int64()),
        "dist": pa.array(out["dist"], pa.int64()),
    })


# --- DuckDB oracle: coarse chain + residual PQ chains + probed ADC ----

def _ivfpq_cte_chain(
    dim: int,
    n_lists: int = IVFPQ_NLISTS,
    c_iters: int = IVFPQ_CITERS,
    m: int = IVFPQ_M,
    k: int = IVFPQ_K,
    r_iters: int = IVFPQ_RITERS,
) -> str:
    """The coarse k-means chain (kmeans._kmeans_cte_chain: q/cfin/afin)
    + the residual table rq + per-subspace residual-PQ chains
    (prefix rp{s}_) ending in rp{s}_cfin / rp{s}_afin."""
    from .kmeans import _kmeans_cte_chain

    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by {m}")
    w = dim // m
    parts = [_kmeans_cte_chain(n_lists, c_iters)]
    parts.append(f""",
rq AS MATERIALIZED (
  SELECT q.vec_id, q.i, q.q - c.w AS q
  FROM q JOIN afin a USING (vec_id) JOIN cfin c ON c.c = a.c AND c.i = q.i),
rp_init AS MATERIALIZED (
  SELECT vec_id, CAST(dense_rank() OVER (ORDER BY vec_id) AS BIGINT) AS c
  FROM (SELECT DISTINCT vec_id FROM rq ORDER BY vec_id LIMIT {k}))""")
    for s in range(m):
        lo = s * w
        parts.append(f""",
rp{s}_q AS MATERIALIZED (
  SELECT vec_id, i - {lo} AS i, q FROM rq
  WHERE i > {lo} AND i <= {lo + w}),
rp{s}_c0 AS MATERIALIZED (
  SELECT rp_init.c, q.i, q.q AS w
  FROM rp_init JOIN rp{s}_q q USING (vec_id))""")
        for t in range(1, r_iters + 2):
            parts.append(f""",
rp{s}_d{t} AS MATERIALIZED (
  SELECT q.vec_id, c.c, SUM((q.q - c.w) * (q.q - c.w)) AS d
  FROM rp{s}_q q JOIN rp{s}_c{t - 1} c USING (i) GROUP BY q.vec_id, c.c),
rp{s}_a{t} AS MATERIALIZED (
  SELECT vec_id, c FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, c ASC) AS rn
    FROM rp{s}_d{t}) WHERE rn = 1)""")
            if t <= r_iters:
                parts.append(f""",
rp{s}_s{t} AS MATERIALIZED (
  SELECT a.c, q.i, SUM(q.q) AS s, COUNT(*) AS n
  FROM rp{s}_a{t} a JOIN rp{s}_q q USING (vec_id) GROUP BY a.c, q.i),
rp{s}_c{t} AS MATERIALIZED (
  SELECT p.c, p.i,
         COALESCE(CASE WHEN s.s % s.n <> 0 AND s.s < 0
                       THEN s.s // s.n - 1 ELSE s.s // s.n END, p.w) AS w
  FROM rp{s}_c{t - 1} p LEFT JOIN rp{s}_s{t} s ON s.c = p.c AND s.i = p.i)""")
        parts.append(f""",
rp{s}_cfin AS MATERIALIZED (SELECT c, i, w FROM rp{s}_c{r_iters}),
rp{s}_afin AS MATERIALIZED (SELECT vec_id, c FROM rp{s}_a{r_iters + 1})""")
    return "".join(parts)


def ivfpq_topk_oracle_sql(
    dim: int,
    query_ids: list[int],
    topk: int,
    *,
    n_lists: int = IVFPQ_NLISTS,
    c_iters: int = IVFPQ_CITERS,
    m: int = IVFPQ_M,
    k: int = IVFPQ_K,
    r_iters: int = IVFPQ_RITERS,
    nprobe: int = IVFPQ_NPROBE,
) -> str:
    """DuckDB mirror of build_ivfpq_index + ivfpq_topk over the pinned
    query vec_ids: probe selection, per-(query, list) residuals and ADC
    all in exact integer arithmetic; query_id = position in query_ids."""
    w = dim // m
    qcase = " ".join(f"WHEN {v} THEN {i}" for i, v in enumerate(query_ids))
    ids = ", ".join(str(v) for v in query_ids)
    per_sub = "\nUNION ALL\n".join(f"""
SELECT p.query_id, a.vec_id, SUM((qr.q - c.w) * (qr.q - c.w)) AS d
FROM iq_probe p
JOIN afin a ON a.c = p.c
JOIN rp{s}_afin pa ON pa.vec_id = a.vec_id
JOIN rp{s}_cfin c ON c.c = pa.c
JOIN iq_res qr ON qr.query_id = p.query_id AND qr.list = p.c
              AND qr.i = c.i + {s * w}
GROUP BY 1, 2""" for s in range(m))
    return _ivfpq_cte_chain(dim, n_lists, c_iters, m, k, r_iters) + f""",
iq_v AS MATERIALIZED (
  SELECT CASE vec_id {qcase} END AS query_id, i, q
  FROM q WHERE vec_id IN ({ids})),
iq_cd AS MATERIALIZED (
  SELECT v.query_id, c.c, SUM((v.q - c.w) * (v.q - c.w)) AS d
  FROM iq_v v JOIN cfin c USING (i) GROUP BY 1, 2),
iq_probe AS MATERIALIZED (
  SELECT query_id, c FROM (
    SELECT query_id, c,
           row_number() OVER (PARTITION BY query_id ORDER BY d ASC, c ASC) AS rn
    FROM iq_cd) WHERE rn <= {nprobe}),
iq_res AS MATERIALIZED (
  SELECT p.query_id, p.c AS list, v.i, v.q - c.w AS q
  FROM iq_probe p
  JOIN iq_v v ON v.query_id = p.query_id
  JOIN cfin c ON c.c = p.c AND c.i = v.i),
iq_adc AS MATERIALIZED (
  SELECT query_id, vec_id, SUM(d) AS dist FROM ({per_sub}) GROUP BY 1, 2),
iq_rank AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist ASC, vec_id ASC) AS rank
  FROM iq_adc)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank,
       vec_id::BIGINT AS vec_id, dist::BIGINT AS dist
FROM iq_rank WHERE rank <= {topk}"""
