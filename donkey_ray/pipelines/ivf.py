"""IVF (inverted-file) ANN index over an embedding column (donkey
analogue [PK]: the persisted kgraph ANN index artifact built in
src/index-kgraph.cpp — file-level, SURVEY.md section 0 — re-grounded as
a partitioned, persisted, RESUMABLE centroid index with the same
manifest treatment as the text index).

Layout:
  out/centroids.parquet           spherical k-means centroids (list_id,
                                  centroid) — small, broadcastable
  out/segments/part-%05d.parquet  (list_id, vec_id, embedding) rows of
                                  the lists owned by this partition,
                                  sorted by (list_id, vec_id) so parquet
                                  row-group stats prune probes
  out/manifest/part-%05d.json     per-partition lineage (counts, sha256)
  out/index_meta.json, out/_SUCCESS

Partitioning: part = list_id % num_partitions, so a query probing
``nprobe`` lists touches at most ``nprobe`` partitions and, within each,
only the row groups whose list_id range matches. ``nprobe = n_lists``
scans everything and is EXACT brute-force cosine — the driver gates that
configuration against the same DuckDB oracle as plain ann_topk; smaller
nprobe trades recall for I/O (recall gated in pytest).

Scale shape: centroids are trained on a deterministic hash-sample
(driver-side numpy — sample size is fixed, independent of corpus size),
assignment is one embarrassingly-parallel map, and the only exchange is
the keyed list->partition groupby. Query-time reads are partition- and
row-group-pruned; nothing ever materializes the full vector set.
"""

from __future__ import annotations

import os
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..functions.hashing import deterministic_sample_mask
from ..state import manifest as mf
from ..util import dataset_to_table
from .ann import _batch_matrix, _normalize

FORMAT_VERSION = 1
MAX_TRAIN_SAMPLE = 65_536


def _spherical_kmeans(sample: np.ndarray, n_lists: int, *, iters: int = 10,
                      seed: int = 42) -> np.ndarray:
    """Deterministic spherical k-means (cosine) on a normalized sample."""
    m = _normalize(np.asarray(sample, dtype=np.float64))
    rng = np.random.default_rng(seed)
    n = len(m)
    k = min(n_lists, n)
    cent = m[rng.choice(n, size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for j in range(k):
            sel = m[assign == j]
            if len(sel):
                cent[j] = sel.sum(axis=0)
        cent = _normalize(cent)
    # stable order: centroids sorted by first dimension then id-free tie
    order = np.lexsort(tuple(cent[:, d] for d in range(cent.shape[1] - 1, -1, -1)))
    return cent[order]


class _IVFPartWriter(mf.PartitionSegmentWriter):
    """One partition's (list_id, vec_id, embedding) rows -> sorted
    segment parquet + manifest entry (shared atomic/resumable writer,
    plus the per-partition n_lists manifest field)."""

    def __init__(self, out_dir: str) -> None:
        super().__init__(
            out_dir, part_col="part",
            sort_keys=[("list_id", "ascending"), ("vec_id", "ascending")],
            count_field="n_vecs", row_group_size=1024,
            name="IVFPartWriter")

    def extra_manifest_fields(self, seg: pa.Table) -> dict:
        return {"n_lists": len(np.unique(
            seg.column("list_id").to_numpy(zero_copy_only=False)))}


def build_ivf_index(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    n_lists: int = 16,
    num_partitions: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_mod: int = 4,
    kmeans_iters: int = 10,
) -> dict:
    """Build (or resume) the IVF index at ``out_dir``. Returns meta."""
    if mf.is_complete(out_dir):
        return mf.load_meta(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    # ---- centroid training: deterministic hash-sample, capped ----
    cent_path = os.path.join(out_dir, "centroids.parquet")
    if not os.path.exists(cent_path):
        def take_sample(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(deterministic_sample_mask(ids, sample_mod)))

        sample_tbl = dataset_to_table(
            ds.map_batches(take_sample, batch_format="pyarrow",
                           zero_copy_batch=True)
        )
        if sample_tbl.num_rows == 0:
            sample_tbl = dataset_to_table(ds)  # tiny input: train on all
        if sample_tbl.num_rows > MAX_TRAIN_SAMPLE:
            sample_tbl = sample_tbl.slice(0, MAX_TRAIN_SAMPLE)
        cent = _spherical_kmeans(
            _batch_matrix(sample_tbl, vec_col), n_lists, iters=kmeans_iters
        )
        fd, tmp = tempfile.mkstemp(dir=out_dir, prefix=".tmp-cent-")
        os.close(fd)
        pq.write_table(
            pa.table(
                {"list_id": pa.array(range(len(cent)), pa.int32()),
                 "centroid": pa.array(cent.tolist(), pa.list_(pa.float64()))}
            ),
            tmp,
        )
        os.replace(tmp, cent_path)
    cent_tbl = pq.read_table(cent_path)
    centroids = _batch_matrix(cent_tbl, "centroid")
    k = len(centroids)
    cent_ref = ray.put(centroids)

    # ---- assignment + keyed list->partition exchange (resumable) ----
    done = mf.validated_done_parts(out_dir, num_partitions)
    skipped = sorted(done)
    if len(done) < num_partitions:
        done_arr = np.array(sorted(done), dtype=np.int32)

        def assign(batch: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            m = _normalize(_batch_matrix(batch, vec_col))
            lists = np.argmax(m @ c.T, axis=1).astype(np.int32)
            part = (lists % num_partitions).astype(np.int32)
            out = pa.table(
                {
                    "list_id": pa.array(lists, pa.int32()),
                    "vec_id": batch.column(id_col).cast(pa.int64()),
                    "embedding": batch.column(vec_col),
                    "part": pa.array(part, pa.int32()),
                }
            )
            if len(done_arr):
                keep = ~np.isin(part, done_arr)
                out = out.filter(pa.array(keep))
            return out

        rows = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        entries = rows.groupby("part").map_groups(
            _IVFPartWriter(out_dir), batch_format="pyarrow"
        )
        new_entries = {int(r["part"]): r for r in entries.take_all()}
    else:
        new_entries = {}

    all_entries = {**done, **new_entries}
    meta = {
        "format_version": FORMAT_VERSION,
        "kind": "ivf_cosine",
        "n_lists": int(k),
        "dim": int(centroids.shape[1]),
        "num_partitions": num_partitions,
        "n_vecs": int(sum(e["n_vecs"] for e in all_entries.values())),
        "parts_built": sorted(int(p) for p in all_entries),
        "parts_skipped_on_resume": skipped,
        "sample_mod": sample_mod,
        "id_col": id_col,
    }
    mf.write_meta(out_dir, meta)
    mf.mark_complete(out_dir)
    return meta


def ivf_topk(
    index_dir: str,
    query_vectors: np.ndarray,
    *,
    k: int = 10,
    nprobe: int | None = None,
) -> pa.Table:
    """Cosine top-k per query via centroid-probed reads.

    Reads ONLY the partitions owning probed lists, filtered to the probed
    list_ids (parquet row-group pruning on the sorted list_id column).
    nprobe=None (= n_lists) probes everything -> exact brute force.
    Returns (query_id, rank, vec_id, cos_sim), tie-break (cos desc,
    vec_id asc), float64."""
    import pyarrow.dataset as pads

    meta = mf.load_meta(index_dir)
    if not mf.is_complete(index_dir):
        raise FileNotFoundError(f"IVF index at {index_dir} is not complete")
    centroids = _batch_matrix(
        pq.read_table(os.path.join(index_dir, "centroids.parquet")), "centroid"
    )
    n_lists = len(centroids)
    nprobe = n_lists if nprobe is None else min(nprobe, n_lists)
    q = _normalize(np.asarray(query_vectors, dtype=np.float64))
    # per query: the nprobe nearest centroid lists
    cent_sims = q @ centroids.T  # (nq, n_lists)
    probe = np.argsort(-cent_sims, axis=1)[:, :nprobe]  # (nq, nprobe)
    probed_lists = np.unique(probe)
    parts = np.unique(probed_lists % meta["num_partitions"])

    paths = [mf.segment_path(index_dir, int(p)) for p in parts
             if os.path.exists(mf.segment_path(index_dir, int(p)))]
    out = {"query_id": [], "rank": [], "vec_id": [], "cos_sim": []}
    if paths:
        data = pads.dataset(paths).to_table(
            columns=["list_id", "vec_id", "embedding"],
            filter=pads.field("list_id").isin(pa.array(probed_lists, pa.int32())),
        )
        lists = data.column("list_id").to_numpy(zero_copy_only=False)
        ids = data.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_batch_matrix(data, "embedding"))
        for qi in range(len(q)):
            sel = np.isin(lists, probe[qi])
            if not sel.any():
                continue
            sims = m[sel] @ q[qi]
            ids_q = ids[sel]
            kk = min(k, len(ids_q))
            top = np.lexsort((ids_q, -sims))[:kk]
            out["query_id"].extend([qi] * kk)
            out["rank"].extend(range(1, kk + 1))
            out["vec_id"].extend(ids_q[top].tolist())
            out["cos_sim"].extend(sims[top].tolist())
    return pa.table(
        {
            "query_id": pa.array(out["query_id"], pa.int64()),
            "rank": pa.array(out["rank"], pa.int32()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "cos_sim": pa.array(out["cos_sim"], pa.float64()),
        }
    )
