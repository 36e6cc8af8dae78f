"""JL random projection and token-entropy quality signal."""

import numpy as np
import pyarrow as pa
import pytest

from donkey_ray.util import dataset_to_table


@pytest.fixture(scope="module")
def vecs(ray_session):
    import ray.data

    rng = np.random.RandomState(3)
    n, d = 300, 64
    mat = rng.randn(n, d).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(mat), pa.list_(pa.float64())),
    })
    return mat, ray.data.from_arrow(tbl).repartition(4)


def test_jl_preserves_pairwise_distances(vecs):
    from donkey_ray.pipelines.project import JL_SCALE, jl_project

    mat, ds = vecs
    out = dataset_to_table(jl_project(ds, k=32)).sort_by(
        [("vec_id", "ascending"), ("dim", "ascending")])
    y = np.asarray(out.column("y").to_pylist(), dtype=np.float64)
    y = y.reshape(len(mat), 32) / (JL_SCALE * np.sqrt(32.0))
    # sampled pairwise distances within 40% (K=32 is coarse; JL bound,
    # not exactness — exactness is the driver oracle's job)
    rng = np.random.RandomState(0)
    idx = rng.randint(0, len(mat), size=(200, 2))
    d_in = np.linalg.norm(mat[idx[:, 0]] - mat[idx[:, 1]], axis=1)
    d_out = np.linalg.norm(y[idx[:, 0]] - y[idx[:, 1]], axis=1)
    ok = d_in > 1e-9
    ratio = d_out[ok] / d_in[ok]
    assert np.median(np.abs(ratio - 1.0)) < 0.2
    assert np.all(ratio > 0.3) and np.all(ratio < 1.9)


def test_jl_layout_invariance_and_determinism(vecs):
    import ray.data

    from donkey_ray.pipelines.project import jl_project

    mat, ds = vecs
    a = dataset_to_table(jl_project(ds)).sort_by(
        [("vec_id", "ascending"), ("dim", "ascending")])
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(mat), dtype=np.int64)),
        "embedding": pa.array(list(mat), pa.list_(pa.float64())),
    })
    b = dataset_to_table(
        jl_project(ray.data.from_arrow(tbl).repartition(11))).sort_by(
        [("vec_id", "ascending"), ("dim", "ascending")])
    assert a.equals(b)
    assert a.num_rows == len(mat) * 16


def test_token_entropy_pinned_values(ray_session):
    import ray.data

    from donkey_ray.pipelines.analyze import token_entropy

    rows = [
        {"doc_id": 0, "text": "a a a a"},          # H = 0
        {"doc_id": 1, "text": "a b c d"},          # H = ln 4
        {"doc_id": 2, "text": "a a b b"},          # H = ln 2
        {"doc_id": 3, "text": ""},                 # no rows
        {"doc_id": 4, "text": "x"},                # H = 0, n=1
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = dataset_to_table(token_entropy(ds)).sort_by("doc_id")
    got = {r["doc_id"]: r["entropy_x1e6"] for r in out.to_pylist()}
    assert set(got) == {0, 1, 2, 4}
    assert got[0] == 0 and got[4] == 0
    # ln 4 = 1.386294...; pinned: floor(ln4*1e6+.5) - 0//4
    assert got[1] == 1386294
    # ln 2 pinned: floor(ln4*1e6+.5) - (2*floor... ) — spot vs direct calc
    s = int(np.floor(2 * np.log(2) * 1e6 + 0.5)) * 2
    assert got[2] == int(np.floor(np.log(4) * 1e6 + 0.5)) - s // 4


def test_token_entropy_orders_quality(ray_session):
    """Repetitive boilerplate scores below varied text of equal length."""
    import ray.data

    from donkey_ray.pipelines.analyze import token_entropy

    varied = " ".join(f"w{i}" for i in range(50))
    boiler = " ".join(["click here now"] * 17)
    ds = ray.data.from_arrow(pa.Table.from_pylist(
        [{"doc_id": 0, "text": varied}, {"doc_id": 1, "text": boiler}]))
    out = {r["doc_id"]: r["entropy_x1e6"]
           for r in dataset_to_table(token_entropy(ds)).to_pylist()}
    assert out[0] > out[1]
