"""Johnson-Lindenstrauss random projection of the embeddings table —
pinned integer spec.

The dimensionality-reduction front of an ANN/clustering stack at scale:
project D-dim vectors to K dims with a deterministic +-1 sign matrix
(Achlioptas 2003's database-friendly JL variant; pairwise distances are
preserved within (1 +- eps) for K = O(ln n / eps^2)):

    y_{v,j} = sum_i q_{v,i} * s_{i,j}

* inputs quantize half-up exactly like k-means: q = floor(x * 1e6
  + 0.5), int64 (pipelines/kmeans.py's pinned quantization);
* s_{i,j} = +1 if hex nibble j of sha256('jl' || i) >= 8 else -1
  (i = input dim 1..D, j = output dim 1..K, K <= 64 — the SIF sign
  construction, pipelines/sif.py, keyed by input dimension);
* the conventional 1/sqrt(K) factor is NOT applied (a global constant
  scales all distances equally; downstream cosine is scale-invariant).

Output: (vec_id, dim 1-based, y) — exact int64, one row per vector per
output dim. |y| <= D * 1e6 * max|x|, ~6.4e7 at D=64 unit-norm inputs.

Scale shape: a pure shuffle-free per-batch map; the (D x K) sign matrix
is rebuilt per actor from sha256 (a few KB — cheaper than shipping).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

JL_SCALE = 10**6
JL_DIM = 16


def _jl_signs(d_in: int, k: int) -> np.ndarray:
    """(d_in, k) int64 of +-1: nibble j of sha256('jl' + str(i))."""
    out = np.empty((d_in, k), dtype=np.int64)
    for i in range(d_in):
        h = hashlib.sha256(f"jl{i + 1}".encode("utf-8")).hexdigest()
        out[i] = [1 if int(h[j], 16) >= 8 else -1 for j in range(k)]
    return out


def jl_project(
    ds: ray.data.Dataset,
    *,
    k: int = JL_DIM,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    if not 1 <= k <= 64:
        raise ValueError("k must be in 1..64 (sha256 nibbles)")

    def project(batch: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "dim": pa.array([], pa.int64()),
                          "y": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        col = batch.column(vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        mat = flat.reshape(batch.num_rows, -1)
        q = np.floor(mat * JL_SCALE + 0.5).astype(np.int64)
        y = q @ _jl_signs(q.shape[1], k)
        ids = batch.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            id_col: pa.array(np.repeat(ids, k)),
            "dim": pa.array(np.tile(np.arange(1, k + 1, dtype=np.int64),
                                    len(ids))),
            "y": pa.array(y.ravel()),
        })

    return ds.map_batches(project, batch_format="pyarrow",
                          zero_copy_batch=True)


def jl_project_oracle_sql(k: int = JL_DIM, *,
                          table: str = "embeddings") -> str:
    """DuckDB mirror: identical quantization, signs, exact-int sums."""
    return f"""
WITH e AS MATERIALIZED (
  SELECT vec_id, t.i,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {JL_SCALE} + 0.5)
              AS BIGINT) AS q
  FROM {table}, unnest(generate_series(1, len(embedding))) AS t(i)),
sgn AS MATERIALIZED (
  SELECT d.i, u.j,
         CASE WHEN strpos('0123456789abcdef',
                          substr(sha256('jl' || d.i), u.j, 1)) - 1 >= 8
              THEN 1 ELSE -1 END AS s
  FROM (SELECT DISTINCT i FROM e) d,
       unnest(generate_series(1, {k})) AS u(j))
SELECT e.vec_id, sgn.j::BIGINT AS dim, sum(e.q * sgn.s)::BIGINT AS y
FROM e JOIN sgn USING (i)
GROUP BY e.vec_id, sgn.j
ORDER BY vec_id, dim"""
