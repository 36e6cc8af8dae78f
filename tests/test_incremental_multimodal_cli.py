"""Incremental (federated + compacted) indexes, multimodal stages, CLI."""

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pytest

from donkey_ray.oracle import BM25Oracle
from donkey_ray.pipelines.build import build_index
from donkey_ray.pipelines.incremental import merge_indexes
from donkey_ray.stages.score import QueryEngine
from donkey_ray.synth import make_corpus, make_queries
from donkey_ray.util import dataset_to_table

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def two_indexes(ray_session, tmp_path_factory):
    import ray.data

    base = tmp_path_factory.mktemp("incr")
    full = make_corpus(200, seed=23)
    a, b = full.slice(0, 120), full.slice(120)
    ia, ib = str(base / "ia"), str(base / "ib")
    build_index(ray.data.from_arrow(a), ia, num_partitions=4,
                query_lang="code", detect_hot=False)
    build_index(ray.data.from_arrow(b), ib, num_partitions=4,
                query_lang="code", detect_hot=False)
    oracle = BM25Oracle.from_corpus(full)
    return ia, ib, oracle, base


def test_federated_query_matches_union_oracle(two_indexes):
    ia, ib, oracle, _ = two_indexes
    eng = QueryEngine([ia, ib])
    assert eng.n_docs == 200
    for row in make_queries(40).to_pylist():
        got = eng.topk(row["text"], int(row["k"]))
        want = oracle.topk(row["text"], int(row["k"]), lang="code")
        assert [d for d, _ in got] == [d for d, _ in want]
        np.testing.assert_allclose(
            [s for _, s in got], [s for _, s in want], atol=1e-9
        )


def test_compaction_matches_union_oracle(two_indexes, ray_session):
    ia, ib, oracle, base = two_indexes
    merged_dir = str(base / "merged")
    meta = merge_indexes([ia, ib], merged_dir, num_partitions=6)
    assert meta["n_docs"] == 200
    eng = QueryEngine(merged_dir)
    for row in make_queries(30).to_pylist():
        got = eng.topk(row["text"], int(row["k"]))
        want = oracle.topk(row["text"], int(row["k"]), lang="code")
        assert [d for d, _ in got] == [d for d, _ in want]


def test_multimodal_image_pipeline(ray_session):
    import ray.data

    from donkey_ray.pipelines.ann import brute_force_topk
    from donkey_ray.stages.multimodal import decode_images, image_features

    rng = np.random.default_rng(9)
    media = [rng.bytes(100 + i) for i in range(20)]
    media[5] = media[0]  # identical bytes -> identical fake pixels
    tbl = pa.table(
        {
            "doc_id": pa.array(range(20), pa.int64()),
            "media": pa.array(media, pa.binary()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    decoded = dataset_to_table(decode_images(ds, height=16, width=16,
                                             concurrency=(1, 2), batch_size=8))
    assert decoded.num_rows == 20
    assert decoded.column("pixels").type.list_size == 16 * 16 * 3
    px = {r["doc_id"]: r["pixels"] for r in decoded.to_pylist()}
    assert px[0] == px[5]
    assert px[0] != px[1]

    feats = dataset_to_table(image_features(ds, height=16, width=16,
                                            concurrency=(1, 2), batch_size=8))
    fmap = {r["doc_id"]: r["feature"] for r in feats.to_pylist()}
    assert len(fmap[0]) == 19
    assert fmap[0] == fmap[5]

    # features feed directly into the similarity-search pipeline
    fd = ray.data.from_arrow(
        pa.table({"vec_id": pa.array(range(20), pa.int64()),
                  "embedding": pa.array([fmap[i] for i in range(20)],
                                        pa.list_(pa.float32()))})
    )
    res = brute_force_topk(fd, np.asarray([fmap[0]], dtype=np.float64), k=3)
    rows = res.to_pylist()
    assert {rows[0]["vec_id"], rows[1]["vec_id"]} == {0, 5}  # cos 1.0 pair


def test_audio_frame_sample(ray_session):
    import ray.data

    from donkey_ray.stages.multimodal import AudioFrameSampleStage

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "media": pa.array([b"aaa", b""], pa.binary()),
        }
    )
    out = dataset_to_table(
        ray.data.from_arrow(tbl).map_batches(
            AudioFrameSampleStage,
            batch_format="pyarrow",
            concurrency=(1, 2),
            batch_size=8,
        )
    )
    assert set(out.column("doc_id").to_pylist()) == {1}  # empty media skipped
    assert all(len(s) > 0 for s in out.column("samples").to_pylist())


def test_cli_end_to_end(tmp_path):
    env = {**os.environ, "PYTHONPATH": REPO}
    corpus = tmp_path / "corpus.parquet"
    idx = tmp_path / "idx"

    import pyarrow.parquet as pq

    pq.write_table(make_corpus(60, seed=3), str(corpus))
    r = subprocess.run(
        [sys.executable, "-m", "donkey_ray.cli", "build", "--input", str(corpus),
         "--output", str(idx), "--partitions", "4", "--no-hot-detection"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    meta = json.loads(r.stdout[r.stdout.index("{"):])
    assert meta["n_docs"] == 60

    r = subprocess.run(
        [sys.executable, "-m", "donkey_ray.cli", "query", "--index", str(idx),
         "--text", "return", "--k", "3"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(l) for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 3 and lines[0]["rank"] == 1

    r = subprocess.run(
        [sys.executable, "-m", "donkey_ray.cli", "stats", "--index", str(idx)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=120,
    )
    assert r.returncode == 0
    assert json.loads(r.stdout[r.stdout.index("{"):])["partitions_on_disk"] == 4


def test_image_decode_dispatch_by_availability():
    """Real PIL decode when installed; deterministic fake otherwise —
    whichever path is live on this machine is exercised."""
    import numpy as np
    import pytest

    from donkey_ray.stages import multimodal as mm

    junk = b"definitely not an image"
    if mm._HAVE_PIL:
        import io

        from PIL import Image

        bio = io.BytesIO()
        Image.new("RGB", (8, 6), (10, 20, 30)).save(bio, "PNG")
        arr = mm._decode_image_real(bio.getvalue(), 4, 4)
        assert arr.shape == (4, 4, 3) and arr.dtype == np.uint8
        assert (arr == np.array([10, 20, 30], dtype=np.uint8)).all()
        with pytest.raises(ValueError):
            mm._decode_image_real(junk, 4, 4)
    else:
        a = mm._fake_rgb(junk, 4, 4)
        assert a.shape == (4, 4, 3) and a.dtype == np.uint8
        assert (a == mm._fake_rgb(junk, 4, 4)).all()  # deterministic


def test_audio_fingerprints(ray_session):
    """Deterministic, level-shift-robust fingerprints: same bytes ->
    same fp; different bytes -> different fp; empty media skipped."""
    import ray.data

    from donkey_ray.stages.multimodal import audio_fingerprints

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "media": pa.array([b"tune-a", b"tune-a", b"tune-b", b""], pa.binary()),
        }
    )
    out = dataset_to_table(
        audio_fingerprints(ray.data.from_arrow(tbl), concurrency=(1, 2))
    ).sort_by([("doc_id", "ascending")])
    ids = out.column("doc_id").to_pylist()
    fps = out.column("fp").to_pylist()
    assert ids == [1, 2, 3]            # empty media skipped
    assert fps[0] == fps[1]            # deterministic on content
    assert fps[0] != fps[2]            # discriminates content
    assert len(fps[0]) > 0 and all(0 <= v < 2**32 for v in fps[0])


def test_cli_verify(tmp_path, ray_session):
    """cli verify: sound index -> ok JSON + exit 0; corrupted segment ->
    checksum FAIL; deleted _SUCCESS -> incomplete FAIL (no subprocess —
    cmd_verify is pure file work)."""
    import io
    from contextlib import redirect_stdout

    import ray.data

    from donkey_ray.cli import main as cli_main
    from donkey_ray.pipelines.build import build_index
    from donkey_ray.state import manifest as mf

    idx = str(tmp_path / "idx")
    build_index(ray.data.from_arrow(make_corpus(40, seed=5)), idx,
                num_partitions=3, detect_hot=False, query_lang="code")

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli_main(["verify", "--index", idx])
    assert rc == 0
    out = json.loads(buf.getvalue())
    assert out["ok"] and out["partitions"] == 3

    # corrupt one segment byte -> checksum mismatch
    seg = mf.segment_path(idx, 1)
    data = bytearray(open(seg, "rb").read())
    data[len(data) // 2] ^= 0xFF
    open(seg, "wb").write(bytes(data))
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli_main(["verify", "--index", idx])
    assert rc == 1 and "checksum" in buf.getvalue()

    # restore; missing _SUCCESS -> incomplete
    open(seg, "wb").write(bytes(b ^ 0xFF if i == len(data) // 2 else b
                                for i, b in enumerate(data)))
    os.remove(os.path.join(idx, "_SUCCESS"))
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli_main(["verify", "--index", idx])
    assert rc == 1 and "_SUCCESS" in buf.getvalue()


def test_merge_preserves_and_guards_analyzer(ray_session, tmp_path):
    """REGRESSION (review finding): merge_indexes must carry
    analyzer_lang into the merged meta (a later delta flush tokenizes
    by it) and refuse to interleave segments built under different
    analyzers."""
    import pyarrow as pa
    import ray.data

    from donkey_ray.pipelines.build import build_index
    from donkey_ray.pipelines.incremental import merge_indexes
    from donkey_ray.state import manifest as mf

    def corpus(path, text):
        return pa.table({
            "repo": pa.array(["r"]), "path": pa.array([path]),
            "commit": pa.array(["c"]), "lang": pa.array(["en"]),
            "content": pa.array([text]),
        })

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    plain = str(tmp_path / "plain")
    build_index(ray.data.from_arrow(corpus("p0", "tables store values")),
                a, num_partitions=2, query_lang="stem",
                analyzer_lang="stem", detect_hot=False)
    build_index(ray.data.from_arrow(corpus("p1", "the table is here")),
                b, num_partitions=2, query_lang="stem",
                analyzer_lang="stem", detect_hot=False)
    build_index(ray.data.from_arrow(corpus("p2", "plain words")),
                plain, num_partitions=2, detect_hot=False)
    out = str(tmp_path / "merged")
    merge_indexes([a, b], out, num_partitions=2)
    assert mf.load_meta(out)["analyzer_lang"] == "stem"
    with pytest.raises(ValueError, match="different analyzers"):
        merge_indexes([a, plain], str(tmp_path / "bad"), num_partitions=2)
