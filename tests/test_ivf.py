"""IVF ANN index: exactness at full probe, recall at partial probe,
resume, and pruned reads."""

import os

import numpy as np
import pyarrow as pa
import pytest

from donkey_ray.pipelines.ann import brute_force_topk
from donkey_ray.pipelines.ivf import build_ivf_index, ivf_topk
from donkey_ray.state import manifest as mf


@pytest.fixture(scope="module")
def vec_ds(ray_session):
    import ray.data

    rng = np.random.default_rng(31)
    # clustered data so IVF lists are meaningful: 8 gaussian blobs
    centers = rng.standard_normal((8, 24)) * 4
    vecs = np.vstack([
        centers[i % 8] + rng.standard_normal(24) for i in range(600)
    ])
    tbl = pa.table(
        {"vec_id": pa.array(range(600), pa.int64()),
         "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64()))}
    )
    return ray.data.from_arrow(tbl), vecs


@pytest.fixture(scope="module")
def built_ivf(vec_ds, tmp_path_factory):
    ds, vecs = vec_ds
    out = str(tmp_path_factory.mktemp("ivf") / "index")
    meta = build_ivf_index(ds, out, n_lists=16, num_partitions=4, sample_mod=2)
    return ds, vecs, out, meta


def test_meta_and_layout(built_ivf):
    _, vecs, out, meta = built_ivf
    assert meta["n_vecs"] == 600 and meta["dim"] == 24
    assert meta["parts_built"] == [0, 1, 2, 3]
    assert os.path.exists(os.path.join(out, "centroids.parquet"))
    assert mf.is_complete(out)


def test_full_probe_is_exact(built_ivf):
    ds, vecs, out, _ = built_ivf
    q = vecs[[0, 17, 333]]
    want = brute_force_topk(ds, q, k=10)
    got = ivf_topk(out, q, k=10, nprobe=None)
    assert got.column("vec_id").to_pylist() == want.column("vec_id").to_pylist()
    np.testing.assert_allclose(
        got.column("cos_sim").to_pylist(),
        want.column("cos_sim").to_pylist(), atol=1e-12,
    )


def test_partial_probe_recall(built_ivf):
    ds, vecs, out, _ = built_ivf
    rng = np.random.default_rng(5)
    q = vecs[rng.choice(600, size=20, replace=False)]
    want = brute_force_topk(ds, q, k=10)
    got = ivf_topk(out, q, k=10, nprobe=4)
    hits = 0
    for qi in range(20):
        w = {r["vec_id"] for r in want.to_pylist() if r["query_id"] == qi}
        g = {r["vec_id"] for r in got.to_pylist() if r["query_id"] == qi}
        hits += len(w & g)
    recall = hits / (20 * 10)
    assert recall >= 0.9, recall


def test_resume_rebuilds_only_missing_partition(vec_ds, tmp_path):
    ds, _ = vec_ds
    out = str(tmp_path / "ivf")
    build_ivf_index(ds, out, n_lists=8, num_partitions=4, sample_mod=2)
    hashes = {p: mf.file_sha256(mf.segment_path(out, p)) for p in range(4)}
    os.unlink(os.path.join(out, "_SUCCESS"))
    os.unlink(mf.manifest_path(out, 2))
    os.unlink(mf.segment_path(out, 2))
    meta2 = build_ivf_index(ds, out, n_lists=8, num_partitions=4, sample_mod=2)
    assert meta2["parts_skipped_on_resume"] == [0, 1, 3]
    after = {p: mf.file_sha256(mf.segment_path(out, p)) for p in range(4)}
    assert after == hashes  # byte-identical (deterministic writer)
