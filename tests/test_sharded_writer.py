"""Sharded write path (VERDICT r4 item 3): K hash-partitioned primary
IndexServers behind one write surface. The contract under test: a
K-shard deployment holding the same docs as a single primary answers
queries IDENTICALLY (global federated BM25 stats + tombstone filtering),
while inserts/deletes/flushes fan out concurrently across the shards.
"""

import pyarrow as pa
import pytest

from donkey_ray.functions.hashing import doc_id_from_key
from donkey_ray.pipelines.build import build_index
from donkey_ray.serve import IndexServer, ShardedWriter
from donkey_ray.synth import make_corpus, make_queries

N_SHARDS = 2


def _rows(n: int, start: int = 7000) -> list[dict]:
    return [
        {
            "repo": "repo-sharded",
            "path": f"src/shardlive_{i}.py",
            "commit": f"s{i:07d}",
            "lang": "py",
            "content": (f"def sharded_handler_{i}(x):\n"
                        f"    return zzyshardtoken + x\n"),
        }
        for i in range(start, start + n)
    ]


@pytest.fixture(scope="module")
def sharded_env(ray_session, tmp_path_factory):
    """The same 120-doc corpus built twice: once as ONE index (the
    single-primary reference) and once hash-partitioned into N_SHARDS
    shard bases (the routing rule the writer uses)."""
    import ray.data

    corpus = make_corpus(120, seed=31)
    base = tmp_path_factory.mktemp("shardw")
    single_dir = str(base / "single")
    build_index(ray.data.from_arrow(corpus), single_dir,
                num_partitions=4, query_lang="code", detect_hot=False)
    ids = [doc_id_from_key(r, p, c) for r, p, c in zip(
        corpus.column("repo").to_pylist(),
        corpus.column("path").to_pylist(),
        corpus.column("commit").to_pylist())]
    shard_dirs = []
    for s in range(N_SHARDS):
        mask = pa.array([i % N_SHARDS == s for i in ids])
        part = corpus.filter(mask)
        assert part.num_rows > 0
        d = str(base / f"shard{s}")
        build_index(ray.data.from_arrow(part), d, num_partitions=2,
                    query_lang="code", detect_hot=False)
        shard_dirs.append(d)
    return corpus, single_dir, shard_dirs


def test_sharded_equals_single_after_concurrent_inserts(sharded_env):
    corpus, single_dir, shard_dirs = sharded_env
    single = IndexServer(single_dir)
    writer = ShardedWriter(shard_dirs, name_prefix="t_shardw_a")
    try:
        rows = _rows(40)
        single.insert(rows)
        res = writer.insert(rows)
        # the batch must actually have split across BOTH primaries
        # (concurrent journals), not funnelled into one
        assert len(res["buffered_per_shard"]) == N_SHARDS
        assert all(v > 0 for v in res["buffered_per_shard"].values())
        # routing is the deterministic key hash
        for r in rows[:5]:
            assert writer._key_shard(r) == doc_id_from_key(
                r["repo"], r["path"], r["commit"]) % N_SHARDS

        single.flush()
        out = writer.flush()
        assert out["flushed"] == len(rows)
        # every shard cut its own delta that now federates
        assert len(writer.all_dirs()) == N_SHARDS * 2

        p = writer.ping()
        assert p["status"] == "ok" and p["n_shards"] == N_SHARDS
        assert p["n_docs"] == corpus.num_rows + len(rows)

        for q in make_queries(12, seed=5).to_pylist():
            got = writer.search(q["text"], int(q["k"]))
            want = single.search(q["text"], int(q["k"]))
            assert [h["doc_id"] for h in got] == [h["doc_id"] for h in want]
            assert [h["score"] for h in got] == pytest.approx(
                [h["score"] for h in want])
        # the inserted token is actually being served
        assert len(writer.search("zzyshardtoken", 10)) == 10
        # query kinds forward through the shared dispatch (not silently
        # degraded to bag-of-words): "and" parity vs the single primary
        for q in make_queries(6, seed=13).to_pylist():
            got = writer.search(q["text"], int(q["k"]), kind="and")
            want = single.search(q["text"], int(q["k"]), kind="and")
            assert [h["doc_id"] for h in got] == [h["doc_id"] for h in want]
            assert [h["score"] for h in got] == pytest.approx(
                [h["score"] for h in want])
        with pytest.raises(ValueError, match="unknown query kind"):
            writer.search("x", 3, kind="nope")
    finally:
        writer.shutdown()


def test_sharded_delete_parity(sharded_env):
    corpus, single_dir, shard_dirs = sharded_env
    single = IndexServer(single_dir)
    writer = ShardedWriter(shard_dirs, name_prefix="t_shardw_b")
    try:
        # tombstone 6 corpus docs (routed to their owning shards)
        victims = [
            {"repo": corpus.column("repo")[i].as_py(),
             "path": corpus.column("path")[i].as_py(),
             "commit": corpus.column("commit")[i].as_py()}
            for i in range(0, 12, 2)
        ]
        dels = writer.delete(victims)
        assert dels["deleted"] == len(victims)
        single.delete(victims)
        victim_ids = {doc_id_from_key(v["repo"], v["path"], v["commit"])
                      for v in victims}
        for q in make_queries(12, seed=9).to_pylist():
            got = writer.search(q["text"], int(q["k"]))
            want = single.search(q["text"], int(q["k"]))
            assert not ({h["doc_id"] for h in got} & victim_ids)
            assert [h["doc_id"] for h in got] == [h["doc_id"] for h in want]
            assert [h["score"] for h in got] == pytest.approx(
                [h["score"] for h in want])
    finally:
        writer.shutdown()


def test_sharded_writer_adoption_and_identity_guard(sharded_env, tmp_path):
    """A second facade over the same names ADOPTS the live primaries;
    a facade claiming different shard dirs under those names must fail
    loudly instead of writing into someone else's journal."""
    import ray.data

    corpus, single_dir, shard_dirs = sharded_env
    w1 = ShardedWriter(shard_dirs, name_prefix="t_shardw_c")
    try:
        w1.insert(_rows(4, start=8600))
        w2 = ShardedWriter(shard_dirs, name_prefix="t_shardw_c")
        # same actors: the second facade sees the first one's buffer
        assert w2.ping()["buffered_inserts"] == 4
        other = str(tmp_path / "other")
        build_index(ray.data.from_arrow(make_corpus(10, seed=77)), other,
                    num_partitions=1, query_lang="code", detect_hot=False)
        with pytest.raises(RuntimeError, match="serves"):
            ShardedWriter([other] * N_SHARDS, name_prefix="t_shardw_c")
    finally:
        w1.shutdown()
