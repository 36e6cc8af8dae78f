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
    """Zero-copy-ish (batch, dim) matrix from a list/fixed_size_list
    embedding column: flatten + reshape, no per-row Python."""
    col = batch.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    if n == 0:
        return flat.reshape(0, 0)
    if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
        offs = col.offsets.to_numpy(zero_copy_only=False)
        lens = np.diff(offs)
        if not (lens == lens[0]).all():
            raise ValueError(f"ragged embedding column {vec_col!r}")
    if flat.size % n:
        raise ValueError(f"ragged embedding column {vec_col!r}")
    return flat.reshape(n, flat.size // n)


def embedding_centroids(
    ds: ray.data.Dataset,
    *,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> pa.Table:
    """Per-label mean vector (class prototypes / cluster centroids).

    Scale shape: classic partial aggregation — each batch reduces to ONE
    (sum vector, count) partial per label it contains (np.add.at scatter
    over the batch matrix), so only O(labels x dim) doubles per batch
    leave a worker and the driver combine is O(labels x dim); the vector
    corpus itself never shuffles. Output is unnested (label, dim, v)
    rows, v = mean of the dimension, float64.
    SQL mirror: avg(embedding[i]) GROUP BY label, i."""

    def partials(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "label": pa.array([], pa.int64()),
                "count": pa.array([], pa.int64()),
                "sums": pa.array([], pa.list_(pa.float64())),
            })
        mat = _batch_matrix(batch, vec_col)
        labels = batch.column(label_col).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), mat.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv, minlength=len(uniq))
        return pa.table({
            "label": pa.array(uniq.astype(np.int64), pa.int64()),
            "count": pa.array(counts.astype(np.int64), pa.int64()),
            "sums": pa.array(list(sums), pa.list_(pa.float64())),
        })

    tbl = dataset_to_table(
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    )
    if tbl.num_rows == 0:
        return pa.table({"label": pa.array([], pa.int64()),
                         "dim": pa.array([], pa.int64()),
                         "v": pa.array([], pa.float64())})
    labels = tbl.column("label").to_numpy(zero_copy_only=False)
    counts = tbl.column("count").to_numpy(zero_copy_only=False)
    smat = _batch_matrix(tbl, "sums")
    uniq, inv = np.unique(labels, return_inverse=True)
    sums = np.zeros((len(uniq), smat.shape[1]), dtype=np.float64)
    np.add.at(sums, inv, smat)
    n = np.bincount(inv, weights=counts, minlength=len(uniq))
    means = sums / n[:, None]
    d = means.shape[1]
    return pa.table({
        "label": pa.array(np.repeat(uniq, d), pa.int64()),
        "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), len(uniq))),
        "v": pa.array(means.ravel(), pa.float64()),
    })


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


PCA_SCALE = 10**6  # quantization scale for inputs AND iteration vectors


def pca_power_iteration(
    ds: ray.data.Dataset,
    *,
    vec_col: str = "embedding",
    iterations: int = 8,
) -> pa.Table:
    """Dominant principal component via pinned INTEGER power iteration
    (the distributed-PCA primitive of an embedding-curation pipeline:
    whitening, drift monitoring, ABTT-style common-direction removal).

    Pinned spec (the DuckDB oracle mirrors it exactly):

    * Inputs quantize half-up in float64: q = floor(v*1e6 + 0.5), int.
    * Scatter matrix C = N * sum(q q^T) - (sum q)(sum q)^T — the
      covariance times N^2, kept as EXACT integers so no cross-engine
      float-sum drift exists.
    * w_0 = [1e6] * dim; each of ``iterations`` steps: u = C @ w,
      w = floor-div(u * 1e6, max(abs(u))) elementwise (floor toward
      -inf on both engines — DuckDB's `//` truncates toward zero and is
      explicitly corrected in the oracle).
    * Sign pin: the entry of max |w| (ties: smallest dim) is made
      positive. Output (dim 1-based, weight_x1e6), |weight| <= 1e6.

    Convergence is the usual power-iteration rate (lambda2/lambda1)^k:
    with a real eigengap (pytest plants one; lambda ratio 0.1 -> 1e-8
    residual at k=8) the result IS the dominant eigenvector; on a
    near-isotropic input the output is still a deterministic pinned
    vector in the top eigenspace region, identical across engines and
    block layouts, just not a converged PC — raise ``iterations`` to
    taste (the oracle unrolls the same count).

    Scale shape: each batch reduces to ONE (count, sum-vector,
    flattened q^T q matrix) partial — O(dim^2) int64 per batch leaves a
    worker, the corpus never shuffles, and the driver fold + dim x dim
    iteration runs in unbounded Python ints (int64 would overflow at
    ~1e10 rows; the partials stay safe because per-batch sums are
    bounded by batch_size * max_q^2)."""

    def partials(batch: pa.Table) -> pa.Table:
        d = {
            "n": pa.array([], pa.int64()),
            "s": pa.array([], pa.list_(pa.int64())),
            "p": pa.array([], pa.list_(pa.int64())),
        }
        if batch.num_rows == 0:
            return pa.table(d)
        mat = _batch_matrix(batch, vec_col)
        q = np.floor(mat * PCA_SCALE + 0.5).astype(np.int64)
        return pa.table({
            "n": pa.array([batch.num_rows], pa.int64()),
            "s": pa.array([q.sum(axis=0)], pa.list_(pa.int64())),
            "p": pa.array([(q.T @ q).ravel()], pa.list_(pa.int64())),
        })

    tbl = dataset_to_table(
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    )
    if tbl.num_rows == 0:
        return pa.table({"dim": pa.array([], pa.int64()),
                         "weight_x1e6": pa.array([], pa.int64())})
    n = sum(tbl.column("n").to_pylist())
    s_rows = tbl.column("s").to_pylist()
    p_rows = tbl.column("p").to_pylist()
    dim = len(s_rows[0])
    # unbounded Python-int fold (the partials are int64-safe; the fold
    # and the iteration below are not, at extreme N)
    s = [sum(r[i] for r in s_rows) for i in range(dim)]
    t = [sum(r[k] for r in p_rows) for k in range(dim * dim)]
    c = [[n * t[i * dim + j] - s[i] * s[j] for j in range(dim)]
         for i in range(dim)]
    w = [PCA_SCALE] * dim
    for _ in range(iterations):
        u = [sum(c[i][j] * w[j] for j in range(dim)) for i in range(dim)]
        m = max(abs(x) for x in u)
        if m == 0:
            raise ValueError("zero scatter matrix: power iteration is undefined")
        w = [(x * PCA_SCALE) // m for x in u]
    lead = min(range(dim), key=lambda i: (-abs(w[i]), i))
    if w[lead] < 0:
        w = [-x for x in w]
    return pa.table({
        "dim": pa.array(np.arange(1, dim + 1, dtype=np.int64)),
        "weight_x1e6": pa.array(w, pa.int64()),
    })


def _pca_cte_chain(iterations: int = 8) -> str:
    """The shared DuckDB CTE chain of pca_power_iteration: the identical
    integer spec with the ``iterations`` steps unrolled, ending in
    ``wfin`` = the sign-pinned weight vector. DuckDB's integer `//`
    truncates toward zero, so each step's floor-division is corrected
    with the remainder CASE (m > 0 always). Every CTE is MATERIALIZED —
    inlining would re-run the parquet scan once per reference."""
    sc = PCA_SCALE
    parts = [f"""
WITH q AS MATERIALIZED (
  SELECT vec_id, i,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {sc} + 0.5) AS HUGEINT) AS q
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
),
nn AS MATERIALIZED (SELECT COUNT(DISTINCT vec_id) AS n FROM q),
s AS MATERIALIZED (SELECT i, SUM(q) AS s FROM q GROUP BY i),
tmat AS MATERIALIZED (SELECT a.i AS i, b.i AS j, SUM(a.q * b.q) AS t
         FROM q a JOIN q b USING (vec_id) GROUP BY a.i, b.i),
c AS MATERIALIZED (SELECT tmat.i, tmat.j,
             (SELECT n FROM nn) * tmat.t - sa.s * sb.s AS c
      FROM tmat JOIN s sa ON sa.i = tmat.i JOIN s sb ON sb.i = tmat.j),
w0 AS MATERIALIZED (SELECT DISTINCT i, CAST({sc} AS HUGEINT) AS w FROM q)"""]
    for k in range(1, iterations + 1):
        parts.append(f""",
u{k} AS MATERIALIZED (SELECT c.i, SUM(c.c * w.w) AS u
         FROM c JOIN w{k - 1} w ON w.i = c.j GROUP BY c.i),
m{k} AS MATERIALIZED (SELECT MAX(ABS(u)) AS m FROM u{k}),
w{k} AS MATERIALIZED (SELECT i,
           CASE WHEN (u * {sc}) % (SELECT m FROM m{k}) <> 0 AND u < 0
                THEN (u * {sc}) // (SELECT m FROM m{k}) - 1
                ELSE (u * {sc}) // (SELECT m FROM m{k}) END AS w
         FROM u{k})""")
    last = f"w{iterations}"
    parts.append(f""",
lead AS (SELECT w FROM {last} ORDER BY ABS(w) DESC, i ASC LIMIT 1),
wfin AS MATERIALIZED (
  SELECT i, CASE WHEN (SELECT w FROM lead) < 0 THEN -w ELSE w END AS w
  FROM {last})""")
    return "".join(parts)


def pca_oracle_sql(iterations: int = 8) -> str:
    """DuckDB mirror of pca_power_iteration: the pinned CTE chain plus
    the final (dim, weight_x1e6) projection."""
    return _pca_cte_chain(iterations) + """
SELECT i::BIGINT AS dim, w::BIGINT AS weight_x1e6 FROM wfin ORDER BY dim"""


def pca_residuals_oracle_sql(iterations: int = 8) -> str:
    """DuckDB mirror of remove_top_component: the PCA chain's wfin
    feeds the per-(vec, dim) projection removal. The float assembly
    order (dot * w, then / norm2, subtract, + 0.5, floor) is mirrored
    exactly; every float operand is an integer < 2^53 so the
    int->double conversions are exact on both engines."""
    return _pca_cte_chain(iterations) + """,
norm2 AS (SELECT SUM(w * w) AS n2 FROM wfin),
dots AS MATERIALIZED (
  SELECT q.vec_id, SUM(q.q * wfin.w) AS dot
  FROM q JOIN wfin ON wfin.i = q.i GROUP BY q.vec_id)
SELECT q.vec_id, q.i::BIGINT AS dim,
       CAST(floor(CAST(q.q AS DOUBLE)
                  - CAST(d.dot AS DOUBLE) * CAST(w.w AS DOUBLE)
                    / CAST((SELECT n2 FROM norm2) AS DOUBLE)
                  + 0.5) AS BIGINT) AS resid_x1e6
FROM q JOIN dots d USING (vec_id) JOIN wfin w ON w.i = q.i
ORDER BY q.vec_id, dim"""


def remove_top_component(
    ds: ray.data.Dataset,
    component: "pa.Table | np.ndarray | list[int]",
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """All-but-the-top common-direction removal (Mu & Viswanath 2018):
    subtract each vector's projection onto the dominant component —
    the standard embedding post-process before cosine retrieval.

    Pinned spec (pca_residuals_oracle_sql mirrors it exactly):
    q = floor(v*1e6 + 0.5); dot = sum_j q_j*w_j and norm2 = sum_j w_j^2
    as EXACT integers; resid_x1e6 = floor(q - (dot*w)/norm2 + 0.5) with
    the multiply-then-divide float64 assembly order fixed (all operands
    are integers < 2^53, so the int->double conversions are exact and
    the IEEE op sequence is engine-independent).

    Scale shape: ``component`` (the dim-sized pca_power_iteration
    output) rides the task closure — O(dim) bytes; the corpus streams
    through one map_batches, no shuffle, no driver materialization.
    Output rows: (vec_id, dim 1-based, resid_x1e6)."""
    if isinstance(component, pa.Table):
        w = np.asarray(component.column("weight_x1e6").to_pylist(),
                       dtype=np.int64)
    else:
        w = np.asarray(component, dtype=np.int64)
    n2 = int((w.astype(object) * w.astype(object)).sum())
    if n2 == 0:
        raise ValueError("zero component: nothing to remove")
    wf = w.astype(np.float64)
    n2f = float(n2)

    def residuals(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "resid_x1e6": pa.array([], pa.int64())})
        mat = _batch_matrix(batch, vec_col)
        if mat.shape[1] != len(w):
            raise ValueError(
                f"component dim {len(w)} != embedding dim {mat.shape[1]}")
        q = np.floor(mat * PCA_SCALE + 0.5).astype(np.int64)
        dot = q @ w  # exact: |dot| <= dim * max|q| * 1e6 < 2^63
        r = np.floor(
            q.astype(np.float64) - (dot.astype(np.float64)[:, None] * wf) / n2f
            + 0.5
        ).astype(np.int64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        d = len(w)
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, d)),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    len(ids))),
            "resid_x1e6": pa.array(r.ravel()),
        })

    return ds.map_batches(residuals, batch_format="pyarrow",
                          zero_copy_batch=True)


def embedding_neardup_pairs(
    ds: ray.data.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.99,
    n_planes: int = 8,
    n_tables: int = 8,
    exact: bool = True,
) -> pa.Table:
    """Pairs with cosine >= threshold.

    exact=True: distributed blocked tiles — the normalized matrix is
    broadcast ONCE (ray.put, O(n*dim)) and every batch computes its
    (batch x n) tile of the gram matrix in a worker task; no O(n^2)
    driver-side matrix ever exists. exact=False: multi-table
    random-hyperplane LSH (scale path beyond broadcastable n*dim):
    candidates only within a (table, bucket) group; recall is
    1-(1-p^k)^L with p = 1-theta/pi — tested >= 0.95 at the default
    (k=8 planes, L=8 tables, cos 0.99) in pytest."""
    if exact:
        mt = dataset_to_table(ds.select_columns([id_col, vec_col]))
        gids = mt.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        gm = _normalize(_batch_matrix(mt, vec_col))
        order = np.argsort(gids)
        gids, gm = gids[order], gm[order]
        glob_ref = ray.put((gids, gm))

        def tile(batch: pa.Table) -> pa.Table:
            g_ids, g_m = ray.get(glob_ref)
            bids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            bm = _normalize(_batch_matrix(batch, vec_col))
            sims = bm @ g_m.T  # (batch, n) tile
            sel = (sims >= threshold) & (g_ids[None, :] > bids[:, None])
            ai, bi = np.nonzero(sel)
            return pa.table(
                {
                    "vec_a": pa.array(bids[ai], pa.int64()),
                    "vec_b": pa.array(g_ids[bi], pa.int64()),
                    "cos_sim": pa.array(sims[ai, bi], pa.float64()),
                }
            )

        out = dataset_to_table(
            ds.map_batches(tile, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=512)
        )
        order = np.lexsort(
            (out.column("vec_b").to_numpy(zero_copy_only=False),
             out.column("vec_a").to_numpy(zero_copy_only=False))
        )
        return out.take(pa.array(order))

    def buckets(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, vec_col)
        # deterministic hyperplanes: same seed in every task; one plane
        # block per table so tables are independent
        planes = np.random.default_rng(42).standard_normal(
            (n_tables, n_planes, m.shape[1])
        )
        keys_out, id_out, vec_out = [], [], []
        ids = batch.column(id_col).cast(pa.int64())
        for t in range(n_tables):
            signs = (m @ planes[t].T) > 0
            keys = (signs * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
            keys_out.append(keys | (np.int64(t) << 32))
            id_out.append(ids)
            vec_out.append(batch.column(vec_col))
        return pa.table(
            {
                "bucket": pa.array(np.concatenate(keys_out), pa.int64()),
                "vec_id": pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                     for a in id_out]
                ),
                "vec": pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                     for a in vec_out]
                ),
            }
        )

    bd = ds.map_batches(buckets, batch_format="pyarrow", zero_copy_batch=True)

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        # degenerate-bucket guard (see dedup.PAIR_ENUM_CAP): sub-cap
        # buckets take the original full m@m.T path bit-identically;
        # oversized buckets enumerate capped pairs and compute sims ONLY
        # for those pairs (one cap x cap tile + one tail matvec), so
        # per-task memory is O(cap^2 + q*d), never O(q^2)
        from .dedup import PAIR_ENUM_CAP, _capped_pair_indices

        ids = group.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) < 2:
            return pa.table({"vec_a": pa.array([], pa.int64()),
                             "vec_b": pa.array([], pa.int64()),
                             "cos_sim": pa.array([], pa.float64())})
        # deterministic ranks (ascending vec_id) so N- and 4N-CPU runs
        # cap identically; sub-cap output is order-insensitive (all
        # pairs enumerated, lo/hi normalized below)
        o = np.argsort(ids, kind="stable")
        ids = ids[o]
        m = _normalize(_batch_matrix(group, "vec"))[o]
        q = len(ids)
        if q <= PAIR_ENUM_CAP:
            sims = m @ m.T
            ai, bi = np.triu_indices(q, k=1)
            sv = sims[ai, bi]
        else:
            ai, bi = _capped_pair_indices(q)
            n_tri = PAIR_ENUM_CAP * (PAIR_ENUM_CAP - 1) // 2
            head = m[:PAIR_ENUM_CAP]
            sims_head = head @ head.T
            sv = np.empty(len(ai), dtype=np.float64)
            sv[:n_tri] = sims_head[ai[:n_tri], bi[:n_tri]]
            sv[n_tri:] = m[PAIR_ENUM_CAP:] @ m[0]
        mask = (sv >= threshold) & (ids[ai] != ids[bi])
        a, b = ids[ai[mask]], ids[bi[mask]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {
                "vec_a": pa.array(lo, pa.int64()),
                "vec_b": pa.array(hi, pa.int64()),
                "cos_sim": pa.array(sv[mask], pa.float64()),
            }
        )

    pairs = bd.groupby("bucket").map_groups(pairs_in_bucket, batch_format="pyarrow")
    out = dataset_to_table(pairs.groupby(["vec_a", "vec_b"]).max("cos_sim"))
    # drop-in parity with the exact path: same column names, same
    # (vec_a, vec_b) ordering — callers read 'cos_sim', not Ray's
    # 'max(cos_sim)' aggregate name
    out = out.rename_columns(["vec_a", "vec_b", "cos_sim"])
    order = np.lexsort(
        (out.column("vec_b").to_numpy(zero_copy_only=False),
         out.column("vec_a").to_numpy(zero_copy_only=False))
    )
    return out.take(pa.array(order))


def object_search(
    ds: ray.data.Dataset,
    query_object_ids: np.ndarray,
    query_features: np.ndarray,
    *,
    threshold: float,
    k: int = 5,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> pa.Table:
    """Multi-feature OBJECT search — donkey's candidate-grouping + rerank
    (reference capability A6, SURVEY.md §2A: per-feature hits are grouped
    by owning object, thresholded by R, scored at the object level).

    A query OBJECT is a set of feature vectors (``query_object_ids[i]``
    owns row i of ``query_features``); the corpus object of a vector is
    its ``label_col``. A hit is a (query feature, corpus vector) pair
    with cosine >= ``threshold``. Per (query object, corpus object):
    ``n_matches`` = hit-pair count, ``max_sim`` = best pair similarity;
    objects rank by (n_matches desc, max_sim desc, object asc), cut to
    top-``k``.

    Scale shape: the query feature matrix is broadcast ONCE (ray.put);
    each batch computes its similarity tile and reduces it to AT MOST
    O(n_query_objects x n_objects_in_batch) partial rows (np.unique over
    packed keys + bincount / np.maximum.at) — the corpus never shuffles
    and the driver combine is O(n_query_objects x n_objects)."""
    qo = np.asarray(query_object_ids, dtype=np.int64)
    if len(qo) and (int(qo.min()) < 0 or int(qo.max()) >= (1 << 32)):
        raise ValueError(
            "object_search packs (query_label, label) into one uint64; "
            "object ids must be in [0, 2^32) — remap ids first")
    qm = _normalize(np.asarray(query_features, dtype=np.float64))
    q_ref = ray.put((qo, qm))

    def partials(batch: pa.Table) -> pa.Table:
        empty = pa.table({"query_label": pa.array([], pa.int64()),
                          "label": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "mx": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        q_obj, q_m = ray.get(q_ref)
        labels = batch.column(label_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        m = _normalize(_batch_matrix(batch, vec_col))
        sims = q_m @ m.T  # (n_query_features, batch) tile
        fi, bi = np.nonzero(sims >= threshold)
        if not len(fi):
            return empty
        if int(labels.min()) < 0 or int(labels.max()) >= (1 << 32):
            # an out-of-range label would bleed into the query half of
            # the packed key — corrupt attribution, not an error
            raise ValueError(
                "object_search corpus labels must be in [0, 2^32)")
        key = q_obj[fi].astype(np.uint64) << np.uint64(32) | labels[bi].astype(np.uint64)
        uniq, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq))
        mx = np.full(len(uniq), -np.inf)
        np.maximum.at(mx, inv, sims[fi, bi])
        return pa.table({
            "query_label": pa.array((uniq >> np.uint64(32)).astype(np.int64)),
            "label": pa.array((uniq & np.uint64(0xFFFFFFFF)).astype(np.int64)),
            "n": pa.array(n.astype(np.int64)),
            "mx": pa.array(mx, pa.float64()),
        })

    tbl = dataset_to_table(
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    )
    out = {"query_label": [], "rank": [], "label": [],
           "n_matches": [], "max_sim": []}
    if tbl.num_rows:
        ql = tbl.column("query_label").to_numpy(zero_copy_only=False)
        lb = tbl.column("label").to_numpy(zero_copy_only=False)
        nn = tbl.column("n").to_numpy(zero_copy_only=False)
        mm = tbl.column("mx").to_numpy(zero_copy_only=False)
        key = ql.astype(np.uint64) << np.uint64(32) | lb.astype(np.uint64)
        uniq, inv = np.unique(key, return_inverse=True)
        n = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(n, inv, nn)
        mx = np.full(len(uniq), -np.inf)
        np.maximum.at(mx, inv, mm)
        uql = (uniq >> np.uint64(32)).astype(np.int64)
        ulb = (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64)
        for q in np.unique(uql):
            sel = np.nonzero(uql == q)[0]
            order = sel[np.lexsort((ulb[sel], -mx[sel], -n[sel]))][:k]
            out["query_label"].extend([int(q)] * len(order))
            out["rank"].extend(range(1, len(order) + 1))
            out["label"].extend(ulb[order].tolist())
            out["n_matches"].extend(n[order].tolist())
            out["max_sim"].extend(mx[order].tolist())
    return pa.table({
        "query_label": pa.array(out["query_label"], pa.int64()),
        "rank": pa.array(out["rank"], pa.int32()),
        "label": pa.array(out["label"], pa.int64()),
        "n_matches": pa.array(out["n_matches"], pa.int64()),
        "max_sim": pa.array(out["max_sim"], pa.float64()),
    })


KNN_EVAL_BROADCAST_MAX = 100_000  # rows; up to here the labeled matrix
# ships once via ray.put (n*dim doubles); beyond it the IVF-probed path
# takes over — no whole-dataset broadcast on the large-n path


def knn_label_eval(
    ds: ray.data.Dataset,
    *,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    index_dir: str | None = None,
    max_broadcast_rows: int = KNN_EVAL_BROADCAST_MAX,
    nprobe: int | None = None,
    n_lists: int = 16,
    force_ivf: bool = False,
) -> ray.data.Dataset:
    """Leave-one-out kNN label prediction over a labeled embedding table
    — the standard embedding-quality eval. For each vector: its k
    nearest OTHER vectors by cosine (ties: vec_id asc) vote; majority
    label wins (ties: count desc, label asc). Output (vec_id,
    true_label, pred_label, correct).

    Dispatch: at or below ``max_broadcast_rows`` the labeled matrix
    ships ONCE via ray.put and every batch computes a (batch x n) tile —
    the small-n fast path (taken even when ``index_dir`` is supplied:
    the two paths are pytest-identical, and paying IVF artifact I/O for
    a table that fits the broadcast budget is pure overhead — VERDICT
    r3 item 8). Beyond the budget — or with ``force_ivf=True`` — the
    global side is the IVF artifact's probed lists instead: each actor
    loads centroids once and reads only the segment partitions its
    queries probe (LRU-cached under a byte budget) — nothing
    corpus-sized is broadcast or driver-resident. nprobe=None probes
    every list, which keeps the eval EXACT (identical to the broadcast
    path; layout-invariance pytest-pinned); smaller nprobe trades recall
    for I/O exactly like ivf_topk."""
    # materialize ONCE so the dispatch count is free and every consumer
    # (index build, prober, label projection) reads the pinned blocks
    # instead of re-executing the upstream plan (the labeled table is
    # index input, O(n·dim) — the same bound build_knn_graph pins)
    ds = ds.materialize()
    if not force_ivf and ds.count() <= max_broadcast_rows:
        return _knn_label_eval_broadcast(
            ds, k=k, vec_col=vec_col, id_col=id_col,
            label_col=label_col)
    return _knn_label_eval_ivf(
        ds, k=k, vec_col=vec_col, id_col=id_col, label_col=label_col,
        index_dir=index_dir, nprobe=nprobe, n_lists=n_lists)


def _knn_label_eval_broadcast(
    ds: ray.data.Dataset,
    *,
    k: int,
    vec_col: str,
    id_col: str,
    label_col: str,
) -> ray.data.Dataset:
    mt = dataset_to_table(ds.select_columns([id_col, vec_col, label_col]))
    gids = mt.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    glabels = mt.column(label_col).to_numpy(
        zero_copy_only=False).astype(np.int64)
    gm = _normalize(_batch_matrix(mt, vec_col))
    order = np.argsort(gids)
    glob_ref = ray.put((gids[order], glabels[order], gm[order]))

    def tile(batch: pa.Table) -> pa.Table:
        g_ids, g_lab, g_m = ray.get(glob_ref)
        bids = batch.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        blab = batch.column(label_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        bm = _normalize(_batch_matrix(batch, vec_col))
        sims = bm @ g_m.T  # (batch, n) tile
        preds = np.empty(len(bids), dtype=np.int64)
        for i in range(len(bids)):
            s = sims[i].copy()
            s[g_ids == bids[i]] = -np.inf   # leave-one-out
            nn = np.lexsort((g_ids, -s))[:k]
            votes, counts = np.unique(g_lab[nn], return_counts=True)
            preds[i] = votes[np.lexsort((votes, -counts))[0]]
        return pa.table({
            "vec_id": pa.array(bids, pa.int64()),
            "true_label": pa.array(blab, pa.int64()),
            "pred_label": pa.array(preds, pa.int64()),
            "correct": pa.array((blab == preds).astype(np.int64),
                                pa.int64()),
        })

    return ds.map_batches(tile, batch_format="pyarrow",
                          zero_copy_batch=True)


class _IVFNeighborProber:
    """Actor-pool stage for the large-n eval: centroids load once per
    actor; each query batch probes its nprobe nearest lists and reads
    only the segment PARTITIONS owning them, LRU-cached under
    ``cache_bytes`` per actor — per-actor memory is O(cache budget),
    never O(corpus), and nothing ships from the driver. Emits the
    top-k OTHER-neighbor edge list (vec_id, true_label, nbr_id): the
    label lookup happens in a downstream keyed join, so the prober
    never needs a global label map either."""

    def __init__(self, index_dir: str, k: int, nprobe: int | None,
                 vec_col: str, id_col: str, label_col: str,
                 cache_bytes: int = 1 << 30) -> None:
        import os
        from collections import OrderedDict

        import pyarrow.parquet as pq

        from ..state import manifest as mf

        self.index_dir = index_dir
        self.meta = mf.load_meta(index_dir)
        self.centroids = _batch_matrix(
            pq.read_table(os.path.join(index_dir, "centroids.parquet")),
            "centroid")
        n_lists = len(self.centroids)
        self.nprobe = n_lists if nprobe is None else min(nprobe, n_lists)
        self.k = k
        self.vec_col, self.id_col, self.label_col = vec_col, id_col, label_col
        self.cache_bytes = cache_bytes
        self._cache: "OrderedDict[int, tuple]" = OrderedDict()
        self._cache_sz = 0

    def _load_part(self, part: int):
        import os

        import pyarrow.parquet as pq

        from ..state import manifest as mf

        if part in self._cache:
            self._cache.move_to_end(part)
            return self._cache[part]
        path = mf.segment_path(self.index_dir, part)
        if not os.path.exists(path):
            entry = (np.array([], np.int32), np.array([], np.int64),
                     np.zeros((0, self.centroids.shape[1])))
        else:
            t = pq.read_table(path, columns=["list_id", "vec_id", "embedding"])
            entry = (
                t.column("list_id").to_numpy(zero_copy_only=False),
                t.column("vec_id").to_numpy(
                    zero_copy_only=False).astype(np.int64),
                _normalize(_batch_matrix(t, "embedding")),
            )
        sz = entry[2].nbytes + entry[0].nbytes + entry[1].nbytes
        while self._cache and self._cache_sz + sz > self.cache_bytes:
            _, old = self._cache.popitem(last=False)
            self._cache_sz -= (old[2].nbytes + old[0].nbytes + old[1].nbytes)
        self._cache[part] = entry
        self._cache_sz += sz
        return entry

    def __call__(self, batch: pa.Table) -> pa.Table:
        bids = batch.column(self.id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        blab = batch.column(self.label_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        bm = _normalize(_batch_matrix(batch, self.vec_col))
        empty = pa.table({
            "vec_id": pa.array([], pa.int64()),
            "true_label": pa.array([], pa.int64()),
            "nbr_id": pa.array([], pa.int64()),
        })
        if len(bids) == 0:
            return empty
        from ..functions.scoring import topk_order

        P = int(self.meta["num_partitions"])
        n_lists = len(self.centroids)
        full = self.nprobe >= n_lists
        if full:
            # every query probes every list: skip the per-query isin
            # mask entirely (it would be all-True) — self-exclusion is
            # the only per-query state
            probe = None
            need_parts = np.arange(P)
        else:
            probe = np.argsort(
                -(bm @ self.centroids.T), axis=1)[:, :self.nprobe]
            need_parts = np.unique(np.unique(probe) % P)
        out_q, out_l, out_n = [], [], []
        # iterate parts outer, queries inner, folding per-query top-k
        # across parts
        best_ids = [None] * len(bids)
        best_sims = [None] * len(bids)
        for part in need_parts:
            lists, ids, m = self._load_part(int(part))
            if not len(ids):
                continue
            sims_all = m @ bm.T  # (part_rows, batch)
            if full:
                # locate each query's own row in this part once
                o = np.argsort(ids, kind="stable")
                p = np.searchsorted(ids, bids, sorter=o)
                pc = np.minimum(p, len(ids) - 1)
                self_hit = ids[o[pc]] == bids
            for i in range(len(bids)):
                if full:
                    s = sims_all[:, i]
                    cand_ids = ids
                    if self_hit[i]:
                        s[o[pc[i]]] = -np.inf  # column used once: safe
                else:
                    sel = np.isin(lists, probe[i])
                    sel &= ids != bids[i]  # leave-one-out
                    if not sel.any():
                        continue
                    s = sims_all[sel, i]
                    cand_ids = ids[sel]
                kk = min(self.k, len(cand_ids))
                top = topk_order(cand_ids, s, kk)
                top = top[np.isfinite(s[top])]  # drop the -inf self row
                if not len(top):
                    continue
                if best_ids[i] is None:
                    best_ids[i], best_sims[i] = cand_ids[top], s[top]
                else:
                    ci = np.concatenate([best_ids[i], cand_ids[top]])
                    cs = np.concatenate([best_sims[i], s[top]])
                    keep = np.lexsort((ci, -cs))[:self.k]
                    best_ids[i], best_sims[i] = ci[keep], cs[keep]
        for i in range(len(bids)):
            if best_ids[i] is None:
                continue
            out_q.extend([int(bids[i])] * len(best_ids[i]))
            out_l.extend([int(blab[i])] * len(best_ids[i]))
            out_n.extend(int(x) for x in best_ids[i])
        return pa.table({
            "vec_id": pa.array(out_q, pa.int64()),
            "true_label": pa.array(out_l, pa.int64()),
            "nbr_id": pa.array(out_n, pa.int64()),
        })


def _knn_label_eval_ivf(
    ds: ray.data.Dataset,
    *,
    k: int,
    vec_col: str,
    id_col: str,
    label_col: str,
    index_dir: str | None,
    nprobe: int | None,
    n_lists: int,
) -> ray.data.Dataset:
    """The beyond-broadcast eval path: IVF artifact (built once if not
    supplied) supplies the neighbor side; neighbor labels resolve via a
    keyed hash join of the top-k edge list (n*k rows, ids only) against
    the (id, label) projection; the vote is a vec_id-keyed partition
    fold. Three bounded exchanges, no corpus-sized broadcast.

    With ``index_dir=None`` the IVF artifact is built into a temp dir,
    the (tiny: n rows × 4 ints) result is materialized, and the temp
    dir is removed before returning — no per-call disk leak."""
    import shutil
    import tempfile

    from ..stages.exchange import keyed_partition_map
    from .ivf import build_ivf_index
    from .joins import hash_join

    tmp_made = index_dir is None
    if tmp_made:
        index_dir = tempfile.mkdtemp(prefix="knn_eval_ivf_")
    build_ivf_index(ds, index_dir, n_lists=n_lists,
                    vec_col=vec_col, id_col=id_col)

    prober = _IVFNeighborProber
    edges = ds.map_batches(
        prober, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(1, 8), batch_size=1024,
        fn_constructor_args=(index_dir, k, nprobe, vec_col, id_col,
                             label_col),
    )

    def label_proj(batch: pa.Table) -> pa.Table:
        return pa.table({
            "nbr_id": batch.column(id_col).cast(pa.int64()),
            "nbr_label": batch.column(label_col).cast(pa.int64()),
        })

    labels = ds.map_batches(label_proj, batch_format="pyarrow",
                            zero_copy_batch=True)
    joined = hash_join(edges, labels, left_on="nbr_id", right_on="nbr_id",
                       how="inner")

    def vote(part: pa.Table) -> pa.Table:
        empty = pa.table({
            "vec_id": pa.array([], pa.int64()),
            "true_label": pa.array([], pa.int64()),
            "pred_label": pa.array([], pa.int64()),
            "correct": pa.array([], pa.int64()),
        })
        if part.num_rows == 0:
            return empty
        q = part.column("vec_id").to_numpy(zero_copy_only=False)
        t = part.column("true_label").to_numpy(zero_copy_only=False)
        nl = part.column("nbr_label").to_numpy(zero_copy_only=False)
        out = {"vec_id": [], "true_label": [], "pred_label": []}
        for qid in np.unique(q):
            m = q == qid
            votes, counts = np.unique(nl[m], return_counts=True)
            pred = votes[np.lexsort((votes, -counts))[0]]
            out["vec_id"].append(int(qid))
            out["true_label"].append(int(t[np.argmax(m)]))
            out["pred_label"].append(int(pred))
        tl = np.asarray(out["true_label"], np.int64)
        pl = np.asarray(out["pred_label"], np.int64)
        return pa.table({
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "true_label": pa.array(tl, pa.int64()),
            "pred_label": pa.array(pl, pa.int64()),
            "correct": pa.array((tl == pl).astype(np.int64), pa.int64()),
        })

    vote.__name__ = "knn_eval_vote"
    out = keyed_partition_map(joined, ["vec_id"], vote)
    if tmp_made:
        out = out.materialize()  # n rows × 4 int64 — bounded
        shutil.rmtree(index_dir, ignore_errors=True)
    return out
