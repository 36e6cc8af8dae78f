"""Similarity search over embedding columns (training-data ops).

Brute-force cosine top-k: the query matrix is broadcast once (ray.put) and
every batch does one numpy matmul — the scale baseline. The LSH-bucketed
variant (random hyperplane signs) is the scale path: candidates only from
matching buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..util import dataset_to_table


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.asarray(col.to_pylist(), dtype=np.float64)


def brute_force_topk(
    ds: ray.data.Dataset,
    query_vectors: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> pa.Table:
    """Exact cosine top-k per query: per-batch matmul + local top-k, then a
    tiny global merge. Returns (query_id, rank, vec_id, cos_sim).

    Tie-break: (cos desc, vec_id asc). Scores in float64."""
    q = _normalize(np.asarray(query_vectors, dtype=np.float64))
    q_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_batch_matrix(batch, vec_col))
        sims = m @ qm.T  # (batch, nq)
        out_q, out_id, out_s = [], [], []
        kk = min(k, len(ids))
        for qi in range(qm.shape[0]):
            s = sims[:, qi]
            idx = np.lexsort((ids, -s))[:kk]
            out_q.extend([qi] * len(idx))
            out_id.extend(ids[idx].tolist())
            out_s.extend(s[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "cos_sim": pa.array(out_s, pa.float64()),
            }
        )

    partial = ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)
    # global merge: per-query union of per-batch top-k is tiny
    tbl = dataset_to_table(partial)
    out_rows = {"query_id": [], "rank": [], "vec_id": [], "cos_sim": []}
    qids = tbl.column("query_id").to_numpy(zero_copy_only=False)
    vids = tbl.column("vec_id").to_numpy(zero_copy_only=False)
    sims = tbl.column("cos_sim").to_numpy(zero_copy_only=False)
    for qi in range(q.shape[0]):
        m = qids == qi
        ids_q, sims_q = vids[m], sims[m]
        idx = np.lexsort((ids_q, -sims_q))[:k]
        for r, j in enumerate(idx, start=1):
            out_rows["query_id"].append(qi)
            out_rows["rank"].append(r)
            out_rows["vec_id"].append(int(ids_q[j]))
            out_rows["cos_sim"].append(float(sims_q[j]))
    return pa.table(
        {
            "query_id": pa.array(out_rows["query_id"], pa.int64()),
            "rank": pa.array(out_rows["rank"], pa.int32()),
            "vec_id": pa.array(out_rows["vec_id"], pa.int64()),
            "cos_sim": pa.array(out_rows["cos_sim"], pa.float64()),
        }
    )


def embedding_neardup_pairs(
    ds: ray.data.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.99,
    n_planes: int = 8,
    exact: bool = True,
) -> pa.Table:
    """Pairs with cosine >= threshold.

    exact=True: all-pairs via a single gram matrix (test scale / oracle
    comparison). exact=False: LSH random-hyperplane buckets (scale path) —
    candidates only within a bucket, so pairs straddling a hyperplane can
    be missed (documented recall<1)."""
    if exact:
        tbl = dataset_to_table(ds.select_columns([id_col, vec_col]))
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(np.asarray(tbl.column(vec_col).to_pylist(), dtype=np.float64))
        sims = m @ m.T
        ai, bi = np.triu_indices(len(ids), k=1)
        mask = sims[ai, bi] >= threshold
        order = np.lexsort((ids[bi[mask]], ids[ai[mask]]))
        return pa.table(
            {
                "vec_a": pa.array(ids[ai[mask]][order], pa.int64()),
                "vec_b": pa.array(ids[bi[mask]][order], pa.int64()),
                "cos_sim": pa.array(sims[ai, bi][mask][order], pa.float64()),
            }
        )

    def buckets(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, vec_col)
        # deterministic hyperplanes: same seed in every task
        planes = np.random.default_rng(42).standard_normal((n_planes, m.shape[1]))
        signs = (m @ planes.T) > 0
        keys = (signs * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(keys, pa.int64()),
                "vec_id": batch.column(id_col).cast(pa.int64()),
                "vec": batch.column(vec_col),
            }
        )

    bd = ds.map_batches(buckets, batch_format="pyarrow", zero_copy_batch=True)

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) < 2:
            return pa.table({"vec_a": pa.array([], pa.int64()),
                             "vec_b": pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.float64())})
        m = _normalize(np.asarray(group.column("vec").to_pylist(), dtype=np.float64))
        sims = m @ m.T
        ai, bi = np.triu_indices(len(ids), k=1)
        mask = sims[ai, bi] >= threshold
        a, b = ids[ai[mask]], ids[bi[mask]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {
                "vec_a": pa.array(lo, pa.int64()),
                "vec_b": pa.array(hi, pa.int64()),
                "cos_sim": pa.array(sims[ai, bi][mask], pa.float64()),
            }
        )

    pairs = bd.groupby("bucket").map_groups(pairs_in_bucket, batch_format="pyarrow")
    return dataset_to_table(pairs.groupby(["vec_a", "vec_b"]).max("cos_sim"))
