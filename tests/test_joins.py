"""Distributed hash join: every join type vs an in-memory reference,
invariant across partition counts."""

import numpy as np
import pyarrow as pa
import pytest

from donkey_ray.pipelines.joins import hash_join
from donkey_ray.util import dataset_to_table


@pytest.fixture(scope="module")
def sides(ray_session):
    import ray.data

    rng = np.random.default_rng(7)
    lk = rng.integers(0, 50, 300)
    left = pa.table(
        {"k": pa.array(lk, pa.int64()),
         "lv": pa.array(range(300), pa.int64())}
    )
    rk = np.unique(rng.integers(0, 80, 60))
    right = pa.table(
        {"rk": pa.array(rk, pa.int64()),
         "rv": pa.array([f"r{v}" for v in rk], pa.string())}
    )
    return ray.data.from_arrow(left), ray.data.from_arrow(right), left, right


def _rows(tbl: pa.Table) -> list[tuple]:
    cols = sorted(tbl.column_names)
    rows = zip(*[tbl.column(c).to_pylist() for c in cols])
    # outer joins emit nulls: sort None-safe
    return sorted(rows, key=lambda r: tuple((v is None, v) for v in r))


@pytest.mark.parametrize("how", ["inner", "left", "right", "full",
                                 "semi", "anti"])
@pytest.mark.parametrize("P", [3, 16])
def test_hash_join_matches_arrow(sides, how, P):
    lds, rds, left, right = sides
    got = dataset_to_table(
        hash_join(lds, rds, left_on="k", right_on="rk", how=how,
                  num_partitions=P)
    )
    want = left.join(
        right, keys="k", right_keys="rk",
        join_type={"inner": "inner", "left": "left outer",
                   "right": "right outer", "full": "full outer",
                   "semi": "left semi", "anti": "left anti"}[how],
    )
    assert sorted(got.column_names) == sorted(want.column_names)
    assert _rows(got) == _rows(want)


def test_hash_join_rejects_unknown_type(sides):
    lds, rds, *_ = sides
    with pytest.raises(ValueError, match="how"):
        hash_join(lds, rds, left_on="k", right_on="rk", how="cross")


def test_asof_join_backward_strict(ray_session):
    """Each left row gets the greatest right ts with same key STRICTLY
    before its own ts; null when none exists."""
    import ray.data

    from donkey_ray.pipelines.joins import asof_join

    left = pa.table(
        {"k": pa.array([1, 1, 1, 2, 3], pa.int64()),
         "ts": pa.array([10, 20, 30, 15, 5], pa.timestamp("us"))}
    )
    right = pa.table(
        {"rk": pa.array([1, 1, 2, 2], pa.int64()),
         "rts": pa.array([10, 25, 1, 15], pa.timestamp("us"))}
    )
    got = dataset_to_table(
        asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                  left_key="k", right_key="rk", left_ts="ts", right_ts="rts",
                  out_col="prev")
    ).sort_by([("k", "ascending"), ("ts", "ascending")])
    prev = got.column("prev").cast(pa.int64()).to_pylist()
    # k=1: ts10 -> none (strict); ts20 -> 10; ts30 -> 25
    # k=2: ts15 -> 1 (15 itself excluded, strict); k=3 -> none
    assert prev == [None, 10, 25, 1, None]


def test_interval_join(ray_session):
    """Keyed interval join: containment inclusive at both bounds, points
    outside every interval drop, keys never cross, and overlapping
    intervals for a key are rejected."""
    import ray.data

    from donkey_ray.pipelines.windows import interval_join

    us = 1  # plain integers as microsecond timestamps
    iv = pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "lo": pa.array([10 * us, 50 * us, 10 * us], pa.timestamp("us")),
        "hi": pa.array([20 * us, 60 * us, 15 * us], pa.timestamp("us")),
    })
    pts = pa.table({
        "event_id": pa.array(list(range(7)), pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 1, 2, 3], pa.int64()),
        "ts": pa.array(
            [10, 20, 21, 50, 9, 16, 12], pa.timestamp("us")
        ),  # lo-edge, hi-edge, gap, second interval, before-all, out, no-iv-key
    })
    got = (
        interval_join(
            ray.data.from_arrow(pts), ray.data.from_arrow(iv),
            point_cols=("event_id",),
        )
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert got["event_id"].tolist() == [0, 1, 3]
    assert got["lo"].astype("int64").tolist() == [10, 10, 50]
    # overlapping intervals for a key must raise
    bad = pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "lo": pa.array([10, 15], pa.timestamp("us")),
        "hi": pa.array([20, 30], pa.timestamp("us")),
    })
    with pytest.raises(Exception, match="non-overlapping"):
        interval_join(
            ray.data.from_arrow(pts), ray.data.from_arrow(bad),
            point_cols=("event_id",),
        ).materialize()


def test_auto_join_plans_and_equality(ray_session):
    """auto_join picks broadcast/bloom/hash by side size and every plan
    is row-identical to the plain hash join."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from donkey_ray.pipelines.joins import auto_join, hash_join
    from donkey_ray.util import dataset_to_table

    rng = np.random.default_rng(31)
    left = pa.table({"k": pa.array(rng.integers(0, 200, 4_000), pa.int64()),
                     "lv": pa.array(np.arange(4_000), pa.int64())})
    right = pa.table({"rk": pa.array(np.arange(0, 200, 3), pa.int64()),
                      "rv": pa.array(np.arange(67), pa.int64())})
    lds, rds = ray.data.from_arrow(left), ray.data.from_arrow(right)

    def canon(t):
        return t.select(sorted(t.column_names)).sort_by(
            [(c, "ascending") for c in sorted(t.column_names)])

    for how in ("inner", "left", "semi", "anti"):
        got, plan = auto_join(lds, rds, left_on="k", right_on="rk", how=how)
        assert plan == "broadcast"
        want = hash_join(lds, rds, left_on="k", right_on="rk", how=how)
        assert canon(dataset_to_table(got)).equals(canon(dataset_to_table(want))), how

    # force the right side over the broadcast bar -> bloom for semi, hash else
    got, plan = auto_join(lds, rds, left_on="k", right_on="rk", how="semi",
                          broadcast_max_rows=10)
    assert plan == "bloom"
    want = hash_join(lds, rds, left_on="k", right_on="rk", how="semi")
    assert canon(dataset_to_table(got)).equals(canon(dataset_to_table(want)))

    got, plan = auto_join(lds, rds, left_on="k", right_on="rk", how="full",
                          broadcast_max_rows=10)
    assert plan == "hash"


def test_bloom_anti_join_equals_plain_anti(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from donkey_ray.pipelines.joins import bloom_anti_join, hash_join
    from donkey_ray.util import dataset_to_table

    rng = np.random.default_rng(41)
    left = pa.table({"k": pa.array(rng.integers(0, 400, 6_000), pa.int64()),
                     "lv": pa.array(np.arange(6_000), pa.int64())})
    right = pa.table({"rk": pa.array(rng.choice(400, 60, replace=False).astype(np.int64))})
    lds, rds = ray.data.from_arrow(left), ray.data.from_arrow(right)
    got = dataset_to_table(bloom_anti_join(
        lds, rds, left_on="k", right_on="rk"
    )).sort_by([("lv", "ascending")])
    want = dataset_to_table(hash_join(
        lds, rds, left_on="k", right_on="rk", how="anti"
    )).sort_by([("lv", "ascending")])
    assert got.equals(want)
    assert 0 < got.num_rows < left.num_rows


def test_joins_nullable_and_large_keys(ray_session):
    """Nullable int64 keys must not detour through float64: above 2^53
    the float path rounds distinct keys together (2^60+1 and 2^60+3 both
    round to 2^60), breaking bloom's no-false-negative guarantee and
    exchange routing. Null keys must match nothing (SQL semantics) on
    every plan."""
    import ray.data

    from donkey_ray.pipelines.joins import bloom_anti_join, bloom_semi_join
    from donkey_ray.util import dataset_to_table

    big = (1 << 60) + 1
    big2 = (1 << 60) + 3  # same float64 as big
    left = pa.table({"k": pa.array([big, big2, None, 7, 8], pa.int64()),
                     "lv": pa.array([0, 1, 2, 3, 4], pa.int64())})
    right = pa.table({"rk": pa.array([big, 7, None], pa.int64())})
    lds, rds = ray.data.from_arrow(left), ray.data.from_arrow(right)

    def lvs(ds):
        t = dataset_to_table(ds)
        return sorted(t.column("lv").to_pylist())

    # reference: Arrow kernel on the undistributed tables
    want_semi = sorted(left.join(right, keys="k", right_keys="rk",
                                 join_type="left semi").column("lv").to_pylist())
    want_anti = sorted(left.join(right, keys="k", right_keys="rk",
                                 join_type="left anti").column("lv").to_pylist())
    assert want_semi == [0, 3] and want_anti == [1, 2, 4]

    assert lvs(hash_join(lds, rds, left_on="k", right_on="rk", how="semi")) == want_semi
    assert lvs(hash_join(lds, rds, left_on="k", right_on="rk", how="anti")) == want_anti
    assert lvs(bloom_semi_join(lds, rds, left_on="k", right_on="rk")) == want_semi
    assert lvs(bloom_anti_join(lds, rds, left_on="k", right_on="rk")) == want_anti
