"""Product quantization (PQ) ANN — Jégou, Douze & Schmid 2011, pinned
integer spec.

PQ is THE memory-bound ANN scale technique (donkey's kgraph analogue for
RAM-constrained fleets, SURVEY.md §2A A4/A5): split the D-dim embedding
into M contiguous subspaces, k-means each subspace to K centroids (the
"codebook"), store every vector as M small codes (M bytes at K<=256 —
a 64-dim float vector compresses 64x), and answer queries by Asymmetric
Distance Computation (ADC): precompute the query's K distances per
subspace once, then score any stored vector with M table lookups.

Everything reuses the pinned-integer k-means spec (pipelines/kmeans.py)
per subspace so a DuckDB oracle mirrors training, codes AND search
bit-for-bit:

* inputs quantize half-up x1e6 (int64);
* per-subspace init = the K globally-smallest ``vec_id`` rows'
  sub-vectors (one min-k pass shared by every subspace);
* ``iterations`` Lloyd steps, floor-div centroid updates, empty cluster
  carries over; assignment ties toward the smallest code;
* ADC distance is EXACT int64: dist(q,d) = sum_m ||q_m - c_{m,code}||^2
  (dims <= 64, values ~1e6 -> far inside int64), so search results are
  hash-exact, no float tolerance anywhere.

Scale shape:
* ``pq_train`` is FUSED: one streaming pass per Lloyd iteration covers
  ALL M subspaces (a per-batch partial is M*K counts + M*K*D/M sums =
  O(K*D) ints — independent of batch and corpus size). M separate
  k-means runs would cost M * iterations passes; fused costs
  ``iterations + 2`` total, the same I/O as one k-means.
* ``pq_encode`` is a shuffle-free map (codebooks ride in the closure,
  O(K*D) ints).
* ``pq_search`` streams the code table; the per-query distance tables
  (M*K ints) ride in the closure, each batch does M vectorized lookups
  + one per-batch top-k, and only O(batches * k) rows reach the driver
  merge — the corpus of codes never shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..state import manifest as mf
from ..util import dataset_to_table
from .ann import _batch_matrix
from .kmeans import KM_SCALE, _assign_ids, _quantize

PQ_M = 4       # subspaces
PQ_K = 16      # codes per subspace
PQ_ITERS = 2   # Lloyd iterations


def _sub_slices(dim: int, m: int) -> list[tuple[int, int]]:
    """Contiguous subspace [lo, hi) column ranges; dim must divide by m."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by {m} subspaces")
    w = dim // m
    return [(s * w, (s + 1) * w) for s in range(m)]


def pq_train(
    ds: ray.data.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = PQ_M,
    k: int = PQ_K,
    iterations: int = PQ_ITERS,
) -> list[list[list[int]]]:
    """Fit M per-subspace codebooks (each K x D/M Python ints, x1e6).

    Fused Lloyd: every iteration is ONE dataset pass emitting per-batch
    (sub, c, n, s) partials for all subspaces together."""
    # --- shared init pass: the k globally smallest ids' full vectors ---
    def initial(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "vid": pa.array([], pa.int64()),
            "qv": pa.array([], pa.list_(pa.int64())),
        })
        if batch.num_rows == 0:
            return empty
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        q = _quantize(_batch_matrix(batch, vec_col))
        take = np.argsort(ids, kind="stable")[:k]
        return pa.table({
            "vid": pa.array(ids[take], pa.int64()),
            "qv": pa.array(list(q[take]), pa.list_(pa.int64())),
        })

    part = dataset_to_table(
        ds.map_batches(initial, batch_format="pyarrow", zero_copy_batch=True)
    )
    if part.num_rows < k:
        raise ValueError(f"pq_train needs >= {k} rows, got {part.num_rows}")
    vids = np.asarray(part.column("vid").to_pylist(), dtype=np.int64)
    order = np.argsort(vids, kind="stable")[:k]
    qvs = part.column("qv").to_pylist()
    full = [[int(x) for x in qvs[i]] for i in order]
    dim = len(full[0])
    slices = _sub_slices(dim, m)
    books: list[list[list[int]]] = [
        [row[lo:hi] for row in full] for lo, hi in slices
    ]

    for _ in range(iterations):
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
            q = _quantize(_batch_matrix(batch, vec_col))
            subs, cs, ns, ss = [], [], [], []
            for si, (lo, hi) in enumerate(slices):
                qm = q[:, lo:hi]
                assign = _assign_ids(qm, bn[si])
                counts = np.bincount(assign, minlength=k)
                sums = np.zeros((k, hi - lo), dtype=np.int64)
                np.add.at(sums, assign, qm)
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
    return books


def pq_encode(
    ds: ray.data.Dataset,
    books: list[list[list[int]]],
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Encode every vector to its M codes (1-based, matching the k-means
    cluster convention): (vec_id, codes list<int64> length M). Pure map;
    the codebooks (O(K*D) ints) ride in the closure."""
    bn = [np.asarray(b, dtype=np.int64) for b in books]
    dim = sum(b.shape[1] for b in bn)
    slices = _sub_slices(dim, len(bn))

    def encode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "codes": pa.array([], pa.list_(pa.int64())),
            })
        q = _quantize(_batch_matrix(batch, vec_col))
        cols = [
            _assign_ids(q[:, lo:hi], bn[si]) + 1
            for si, (lo, hi) in enumerate(slices)
        ]
        codes = np.stack(cols, axis=1).astype(np.int64)
        return pa.table({
            "vec_id": batch.column(id_col).cast(pa.int64()),
            "codes": pa.array(list(codes), pa.list_(pa.int64())),
        })

    return ds.map_batches(encode, batch_format="pyarrow",
                          zero_copy_batch=True)


def pq_codes_unnested(encoded: ray.data.Dataset) -> ray.data.Dataset:
    """(vec_id, sub 1-based, code) — the SQL-comparable code table."""
    def unnest(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "sub": pa.array([], pa.int64()),
                "code": pa.array([], pa.int64()),
            })
        codes = batch.column("codes")
        m = len(codes[0].as_py())
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        flat = np.asarray(
            codes.combine_chunks().flatten().to_numpy(zero_copy_only=False),
            dtype=np.int64,
        ) if isinstance(codes, pa.ChunkedArray) else np.asarray(
            codes.flatten().to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, m).astype(np.int64)),
            "sub": pa.array(np.tile(np.arange(1, m + 1), len(ids))
                            .astype(np.int64)),
            "code": pa.array(flat),
        })

    return encoded.map_batches(unnest, batch_format="pyarrow",
                               zero_copy_batch=True)


def pq_search(
    encoded: ray.data.Dataset,
    books: list[list[list[int]]],
    query_vectors: np.ndarray,
    *,
    k: int = 10,
) -> pa.Table:
    """ADC top-k per query over the code table: per query, one M x K
    integer distance table; per batch, M vectorized lookups + local
    top-k; tiny driver merge. Returns (query_id, rank, vec_id, dist)
    with EXACT int64 distances (ties dist asc, vec_id asc).

    ADC approximates true distance by sum of per-subspace distances to
    the assigned centroids — recall is pytest-gated against brute
    force; determinism is exact by construction."""
    bn = [np.asarray(b, dtype=np.int64) for b in books]
    m = len(bn)
    dim = sum(b.shape[1] for b in bn)
    slices = _sub_slices(dim, m)
    qm = np.floor(np.asarray(query_vectors, dtype=np.float64)
                  * KM_SCALE + 0.5).astype(np.int64)
    nq = qm.shape[0]
    # dtab[qi, si, c] = ||q_sub - centroid||^2, exact int64
    dtab = np.zeros((nq, m, bn[0].shape[0]), dtype=np.int64)
    for si, (lo, hi) in enumerate(slices):
        diff = qm[:, None, lo:hi] - bn[si][None, :, :]
        dtab[:, si, :] = np.einsum("qcd,qcd->qc", diff, diff)
    dtab_ref = ray.put(dtab)

    def local_topk(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "query_id": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "dist": pa.array([], pa.int64()),
        })
        if batch.num_rows == 0:
            return empty
        dt = ray.get(dtab_ref)
        ids = batch.column("vec_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        codes_col = batch.column("codes")
        if isinstance(codes_col, pa.ChunkedArray):
            codes_col = codes_col.combine_chunks()
        flat = np.asarray(codes_col.flatten().to_numpy(
            zero_copy_only=False), dtype=np.int64)
        codes = flat.reshape(len(ids), m) - 1  # back to 0-based
        out_q, out_id, out_d = [], [], []
        kk = min(k, len(ids))
        subs = np.arange(m)
        for qi in range(nq):
            d = dt[qi][subs[None, :], codes].sum(axis=1)
            idx = np.lexsort((ids, d))[:kk]
            out_q.extend([qi] * len(idx))
            out_id.extend(ids[idx].tolist())
            out_d.extend(d[idx].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_id, pa.int64()),
            "dist": pa.array(out_d, pa.int64()),
        })

    tbl = dataset_to_table(
        encoded.map_batches(local_topk, batch_format="pyarrow",
                            zero_copy_batch=True)
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


# --- DuckDB oracle: per-subspace k-means chains + ADC, all integer ----

def _pq_cte_chain(
    dim: int, m: int = PQ_M, k: int = PQ_K, iterations: int = PQ_ITERS
) -> str:
    """Per-subspace pinned k-means chains (prefix p{s}_) ending in
    p{s}_afin (vec_id, c) and p{s}_cfin (c, i, w with i local 1-based).
    Mirrors pipelines/kmeans._kmeans_cte_chain per subspace; the shared
    init is the K smallest vec_ids (same rows for every subspace)."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by {m}")
    w = dim // m
    sc = KM_SCALE
    parts = [f"""
WITH pq_q AS MATERIALIZED (
  SELECT vec_id, i,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {sc} + 0.5) AS HUGEINT) AS q
  FROM embeddings, unnest(generate_series(1, {dim})) AS t(i)
),
pq_init AS MATERIALIZED (
  SELECT vec_id, CAST(dense_rank() OVER (ORDER BY vec_id) AS BIGINT) AS c
  FROM (SELECT DISTINCT vec_id FROM pq_q ORDER BY vec_id LIMIT {k})
)"""]
    for s in range(m):
        lo = s * w  # local i = global i - lo
        parts.append(f""",
p{s}_q AS MATERIALIZED (
  SELECT vec_id, i - {lo} AS i, q FROM pq_q
  WHERE i > {lo} AND i <= {lo + w}),
p{s}_c0 AS MATERIALIZED (
  SELECT pq_init.c, q.i, q.q AS w
  FROM pq_init JOIN p{s}_q q USING (vec_id))""")
        for t in range(1, iterations + 2):
            parts.append(f""",
p{s}_d{t} AS MATERIALIZED (
  SELECT q.vec_id, c.c, SUM((q.q - c.w) * (q.q - c.w)) AS d
  FROM p{s}_q q JOIN p{s}_c{t - 1} c USING (i) GROUP BY q.vec_id, c.c),
p{s}_a{t} AS MATERIALIZED (
  SELECT vec_id, c FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, c ASC) AS rn
    FROM p{s}_d{t}) WHERE rn = 1)""")
            if t <= iterations:
                parts.append(f""",
p{s}_s{t} AS MATERIALIZED (
  SELECT a.c, q.i, SUM(q.q) AS s, COUNT(*) AS n
  FROM p{s}_a{t} a JOIN p{s}_q q USING (vec_id) GROUP BY a.c, q.i),
p{s}_c{t} AS MATERIALIZED (
  SELECT p.c, p.i,
         COALESCE(CASE WHEN s.s % s.n <> 0 AND s.s < 0
                       THEN s.s // s.n - 1 ELSE s.s // s.n END, p.w) AS w
  FROM p{s}_c{t - 1} p LEFT JOIN p{s}_s{t} s ON s.c = p.c AND s.i = p.i)""")
        parts.append(f""",
p{s}_cfin AS MATERIALIZED (SELECT c, i, w FROM p{s}_c{iterations}),
p{s}_afin AS MATERIALIZED (SELECT vec_id, c FROM p{s}_a{iterations + 1})""")
    return "".join(parts)


def pq_codes_oracle_sql(
    dim: int, m: int = PQ_M, k: int = PQ_K, iterations: int = PQ_ITERS
) -> str:
    """DuckDB mirror of pq_train + pq_encode: (vec_id, sub, code)."""
    union = "\nUNION ALL\n".join(
        f"SELECT vec_id, {s + 1} AS sub, c AS code FROM p{s}_afin"
        for s in range(m)
    )
    return _pq_cte_chain(dim, m, k, iterations) + f"""
SELECT vec_id::BIGINT AS vec_id, sub::BIGINT AS sub, code::BIGINT AS code
FROM ({union}) ORDER BY vec_id, sub"""


def pq_search_oracle_sql(
    dim: int,
    query_ids: list[int],
    topk: int,
    m: int = PQ_M,
    k: int = PQ_K,
    iterations: int = PQ_ITERS,
) -> str:
    """DuckDB mirror of pq_search over the pinned query vec_ids: ADC
    distance = per-subspace ||q_sub - assigned centroid||^2 summed, all
    integer; query_id = position in query_ids."""
    qcase = " ".join(
        f"WHEN {v} THEN {i}" for i, v in enumerate(query_ids)
    )
    ids = ", ".join(str(v) for v in query_ids)
    per_sub = "\nUNION ALL\n".join(f"""
SELECT qv.query_id, a.vec_id,
       SUM((qv.q - c.w) * (qv.q - c.w)) AS d
FROM p{s}_afin a
JOIN p{s}_cfin c ON c.c = a.c
JOIN (SELECT CASE vec_id {qcase} END AS query_id, i - {s * (dim // m)} AS i, q
      FROM pq_q WHERE vec_id IN ({ids})
        AND i > {s * (dim // m)} AND i <= {(s + 1) * (dim // m)}) qv
  ON qv.i = c.i
GROUP BY 1, 2""" for s in range(m))
    return _pq_cte_chain(dim, m, k, iterations) + f""",
pq_dist AS (SELECT query_id, vec_id, SUM(d) AS dist
            FROM ({per_sub}) GROUP BY 1, 2),
pq_rank AS (SELECT query_id, vec_id, dist,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY dist ASC, vec_id ASC) AS rank
            FROM pq_dist)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, vec_id,
       dist::BIGINT AS dist
FROM pq_rank WHERE rank <= {topk}"""


# --- persisted PQ index artifact (the kgraph-file analogue) -----------

PQ_FORMAT_VERSION = 1


class _PQPartWriter(mf.PartitionSegmentWriter):
    """One partition's (vec_id, codes) rows -> sorted segment parquet +
    manifest entry (shared atomic/resumable writer)."""

    def __init__(self, out_dir: str) -> None:
        super().__init__(
            out_dir, part_col="part", sort_keys=[("vec_id", "ascending")],
            count_field="n_vecs", row_group_size=4096, name="PQPartWriter")


def build_pq_index(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = PQ_M,
    k: int = PQ_K,
    iterations: int = PQ_ITERS,
    num_partitions: int = 8,
) -> dict:
    """Build (or reuse) the persisted PQ index: trained codebooks
    (books.json), the compressed code table as hash-partitioned sorted
    segments with per-partition lineage manifests, index_meta.json and
    a _SUCCESS marker — the same artifact treatment as the text and IVF
    indexes (donkey's persisted kgraph index file, SURVEY.md A4/A8).

    The float vectors never persist here: the artifact stores M small
    codes per vector (64x smaller at dim=64, M=4), which is the point —
    a serving fleet holds the code table + books in RAM and answers ADC
    queries without touching the raw embeddings."""
    import os

    from ..state import manifest as mf

    if mf.is_complete(out_dir):
        return mf.load_meta(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    books = pq_train(ds, vec_col=vec_col, id_col=id_col, m=m, k=k,
                     iterations=iterations)
    mf.atomic_write_json(os.path.join(out_dir, "books.json"),
                         {"m": m, "k": k, "books": books})

    def add_part(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part",
            pa.array((ids % num_partitions).astype(np.int32), pa.int32()),
        )

    rows = (
        pq_encode(ds, books, vec_col=vec_col, id_col=id_col)
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(_PQPartWriter(out_dir), batch_format="pyarrow")
    )
    entries = {int(r["part"]): r for r in rows.take_all()}
    meta = {
        "format_version": PQ_FORMAT_VERSION,
        "kind": "pq",
        "m": m,
        "k": k,
        "iterations": iterations,
        "num_partitions": num_partitions,
        "parts_built": sorted(entries),
        "n_vecs": int(sum(e["n_vecs"] for e in entries.values())),
    }
    mf.write_meta(out_dir, meta)
    mf.mark_complete(out_dir)
    return meta


def load_pq_books(out_dir: str) -> list[list[list[int]]]:
    import json
    import os

    with open(os.path.join(out_dir, "books.json")) as f:
        return json.load(f)["books"]


def pq_index_topk(
    out_dir: str,
    query_vectors: np.ndarray,
    *,
    k: int = 10,
) -> pa.Table:
    """ADC top-k against the persisted PQ index: stream the code
    segments (parallel parquet read), books from books.json."""
    import os

    from ..state import manifest as mf

    meta = mf.load_meta(out_dir)
    paths = [mf.segment_path(out_dir, p) for p in meta["parts_built"]]
    missing = [p for p in paths if not os.path.exists(p)]
    if missing:
        # silently serving 7/8 of the corpus would be a wrong top-k with
        # no symptom — a lost code segment is an integrity error
        raise FileNotFoundError(
            f"PQ index {out_dir} is missing {len(missing)} code "
            f"segment(s): {missing[:3]}"
        )
    encoded = ray.data.read_parquet(paths)
    return pq_search(encoded, load_pq_books(out_dir), query_vectors, k=k)
