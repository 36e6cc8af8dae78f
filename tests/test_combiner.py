"""Map-side combiner path (ship pre-encoded runs through the shuffle)
must produce byte-identical segments and oracle-identical queries."""

import glob
import os

import pytest

from donkey_ray.oracle import BM25Oracle
from donkey_ray.pipelines.build import build_index
from donkey_ray.stages.score import QueryEngine
from donkey_ray.state import manifest as mf
from donkey_ray.synth import make_corpus, make_queries


def test_combined_build_identical_to_raw(ray_session, tmp_path):
    import ray.data

    corpus = make_corpus(250, seed=31)
    oracle = BM25Oracle.from_corpus(corpus)
    outs = {}
    for name, combine in [("raw", False), ("combined", True)]:
        out = str(tmp_path / name)
        build_index(ray.data.from_arrow(corpus), out, num_partitions=6,
                    query_lang="code", sample_mod=4, combine=combine)
        outs[name] = out
    # byte-identical segments (same format, same deterministic encode)
    h = {
        name: {
            os.path.basename(p): mf.file_sha256(p)
            for p in glob.glob(os.path.join(out, "segments", "*"))
        }
        for name, out in outs.items()
    }
    assert h["raw"] == h["combined"]
    eng = QueryEngine(outs["combined"])
    for row in make_queries(30).to_pylist():
        got = eng.topk(row["text"], int(row["k"]))
        want = oracle.topk(row["text"], int(row["k"]), lang="code")
        assert [d for d, _ in got] == [d for d, _ in want]
        assert [s for _, s in got] == pytest.approx([s for _, s in want], abs=1e-9)
