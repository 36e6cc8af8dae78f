"""End-to-end delta ingest (VERDICT r3 item 7): 3-shard arrival through
the persisted-probe chain — cross-shard near-dups dropped via ngram /
minhash / simhash artifacts, intra-shard dups dropped first-wins,
survivors indexed and federated-searchable, per-shard resume."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

def _text(tag: str, extra: str = "") -> str:
    """20 words of tag-disjoint vocabulary (cross-doc jaccard ~0) plus
    optional distinguishing tokens."""
    body = " ".join(f"{tag}word{j}" for j in range(20))
    return f"{body} {extra}".strip()


def _doc(i: int, text: str) -> dict:
    return {"repo": "r", "path": f"f{i}.txt", "commit": "c0",
            "lang": "en", "content": text}


def _write_shard(path, docs):
    cols = {k: pa.array([d[k] for d in docs], pa.string())
            for k in ("repo", "path", "commit", "lang", "content")}
    pq.write_table(pa.table(cols), path)


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    root = tmp_path_factory.mktemp("ingest_shards")
    # shard 1: 6 docs with pairwise-disjoint vocabularies
    s1 = [_doc(i, _text(f"s1d{i}", f"uniqueonetoken{i}"))
          for i in range(6)]
    # shard 2: a near-copy of shard-1 doc 2 (one word changed), an
    # intra-shard near-dup pair, and 3 unique docs
    s2 = ([_doc(10, s1[2]["content"].replace("s1d2word7", "changed"))]
          + [_doc(11, _text("twin", "twinA")),
             _doc(12, _text("twin", "twinB"))]
          + [_doc(13 + i, _text(f"s2d{i}", f"uniquetwotoken{i}"))
             for i in range(3)])
    # shard 3: a near-copy of a shard-2 survivor + 2 unique docs
    s3 = ([_doc(20, s2[3]["content"].replace("uniquetwotoken0", "copyx"))]
          + [_doc(21 + i, _text(f"s3d{i}", f"uniquethreetoken{i}"))
             for i in range(2)])
    paths = []
    for n, docs in (("s1", s1), ("s2", s2), ("s3", s3)):
        p = str(root / f"{n}.parquet")
        _write_shard(p, docs)
        paths.append(p)
    return paths


def test_ingest_chain_dedup_and_query(ray_session, shards, tmp_path):
    from donkey_ray.pipelines.ingest import (chain_engine,
                                             chain_index_dirs,
                                             ingest_delta, load_state)

    state = str(tmp_path / "chain")
    m1 = ingest_delta(state, shards[0], shard_id="s1")
    assert m1["n_survivors"] == 6 and m1["n_dup_rows"] == 0

    m2 = ingest_delta(state, shards[1], shard_id="s2")
    # dropped: the shard-1 near-copy (all 3 probes fire on it) and one
    # of the intra-shard twins -> 4 survivors of 6
    assert m2["n_survivors"] == 4
    assert m2["n_dup_rows"] > 0

    m3 = ingest_delta(state, shards[2], shard_id="s3")
    # dropped: the near-copy of the shard-2 survivor -> 2 of 3
    assert m3["n_survivors"] == 2

    st = load_state(state)
    assert st["shards"] == ["s1", "s2", "s3"]
    assert len(chain_index_dirs(state)) == 3

    eng = chain_engine(state)
    assert eng.n_docs == 12  # 6 + 4 + 2, exact federated stats
    # every surviving shard's unique token is searchable
    for tok in ("uniqueonetoken3", "uniquetwotoken1", "uniquethreetoken1"):
        hits = eng.topk(tok, 3)
        assert len(hits) == 1, tok
    # exactly one of the intra-shard twins survived
    assert len(eng.topk("twinword3", 5)) == 1
    # the dropped near-copies are NOT in the corpus
    assert eng.topk("changed", 3) == []
    assert eng.topk("copyx", 3) == []


def test_ingest_idempotent_and_resume(ray_session, shards, tmp_path,
                                      monkeypatch):
    import donkey_ray.pipelines.ingest as ing

    state = str(tmp_path / "chain_r")
    ing.ingest_delta(state, shards[0], shard_id="s1")

    # idempotent: a second call returns the recorded meta without work
    before = ing.load_state(state)
    m_again = ing.ingest_delta(state, shards[0], shard_id="s1")
    assert m_again["n_survivors"] == 6
    assert ing.load_state(state) == before

    # crash mid-shard: survivors snapshot lands, then the index build
    # dies; the rerun must NOT redo the dedup (snapshot mtime pinned)
    # and must complete from the markers
    import donkey_ray.pipelines.build as build_mod

    real_build = build_mod.build_index
    calls = {"n": 0}

    def dying_build(*a, **k):
        calls["n"] += 1
        raise RuntimeError("simulated crash before indexing")

    monkeypatch.setattr(build_mod, "build_index", dying_build)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ing.ingest_delta(state, shards[1], shard_id="s2")
    assert calls["n"] == 1
    sdir = os.path.join(state, "shards", "s2")
    assert os.path.exists(os.path.join(sdir, "_SURVIVORS_DONE"))
    assert not os.path.exists(os.path.join(sdir, "_SHARD_DONE"))
    # the half-ingested shard is not in the chain yet
    assert ing.load_state(state)["shards"] == ["s1"]
    snap_mtime = os.path.getmtime(os.path.join(sdir, "_SURVIVORS_DONE"))

    monkeypatch.setattr(build_mod, "build_index", real_build)
    m2 = ing.ingest_delta(state, shards[1], shard_id="s2")
    assert m2["n_survivors"] == 4
    assert os.path.getmtime(
        os.path.join(sdir, "_SURVIVORS_DONE")) == snap_mtime
    assert ing.load_state(state)["shards"] == ["s1", "s2"]

    # spec pinning: a conflicting explicit spec on a later shard raises
    with pytest.raises(ValueError, match="disagrees"):
        ing.ingest_delta(state, shards[2], shard_id="s3",
                         spec={**ing.DEFAULT_SPEC, "minhash_threshold": 0.9})


def test_ingest_cli_round_trip(ray_session, shards, tmp_path, capsys):
    """The cli surface: ingest-delta twice, then ingest-search."""
    from donkey_ray.cli import main

    state = str(tmp_path / "chain_cli")
    rc = main(["ingest-delta", "--state", state, "--shard", shards[0],
               "--shard-id", "s1"])
    assert rc == 0
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["n_survivors"] == 6

    rc = main(["ingest-delta", "--state", state, "--shard", shards[1],
               "--shard-id", "s2"])
    assert rc == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["n_survivors"] == 4

    import io
    import sys as _sys

    monkey_in = io.StringIO("uniquetwotoken1\n")
    old = _sys.stdin
    _sys.stdin = monkey_in
    try:
        rc = main(["ingest-search", "--state", state, "--k", "3"])
    finally:
        _sys.stdin = old
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    head = json.loads(lines[0])
    assert head["n_docs"] == 10 and head["n_indexes"] == 2
    hits = json.loads(lines[1])
    assert len(hits) == 1 and hits[0]["rank"] == 1


def test_ingest_manifest_before_done_marker(ray_session, shards, tmp_path):
    """REGRESSION (review findings, both directions): the manifest is
    written BEFORE the done marker, so a crash between the two re-runs
    the marker-gated steps and keeps membership (no orphan); and a
    completed shard deliberately ABSENT from the manifest (folded away
    by compact_chain) is NOT re-appended by a replayed ingest call —
    re-adding it would double-count its docs in the federation."""
    import donkey_ray.pipelines.ingest as ing
    from donkey_ray.state import manifest as mf

    state = str(tmp_path / "chain_m")
    ing.ingest_delta(state, shards[0], shard_id="s1")
    assert ing.load_state(state)["shards"] == ["s1"]

    # crash window: done marker missing but manifest already updated —
    # the rerun completes from markers and membership is unchanged
    os.remove(os.path.join(state, "shards", "s1", "_SHARD_DONE"))
    m = ing.ingest_delta(state, shards[0], shard_id="s1")
    assert m["n_survivors"] == 6
    assert ing.load_state(state)["shards"] == ["s1"]

    # compaction respect: a done shard removed from the manifest stays
    # out when its ingest call is replayed
    st = ing.load_state(state)
    st["shards"] = []
    mf.atomic_write_json(os.path.join(state, "manifest.json"), st)
    m = ing.ingest_delta(state, shards[0], shard_id="s1")
    assert m["n_survivors"] == 6
    assert ing.load_state(state)["shards"] == []
    # restore for the remainder of the test
    st["shards"] = ["s1"]
    mf.atomic_write_json(os.path.join(state, "manifest.json"), st)

    # spec pinned at chain CREATION: a crashed-first-shard rerun with a
    # different spec is refused even though no shard completed yet
    state2 = str(tmp_path / "chain_s")
    os.makedirs(os.path.join(state2, "shards", "sX"), exist_ok=True)
    ing.load_state(state2)  # no manifest yet
    # first call pins the spec up front...
    import donkey_ray.pipelines.build as build_mod
    import pytest as _pt

    real = build_mod.build_index

    def die(*a, **k):
        raise RuntimeError("boom")

    build_mod.build_index = die
    try:
        with _pt.raises(RuntimeError):
            ing.ingest_delta(state2, shards[0], shard_id="s1")
    finally:
        build_mod.build_index = real
    # ...so a resume with a conflicting spec fails loudly
    with _pt.raises(ValueError, match="disagrees"):
        ing.ingest_delta(state2, shards[0], shard_id="s1",
                         spec={**ing.DEFAULT_SPEC, "ngram_threshold": 0.9})


def test_compact_chain(ray_session, shards, tmp_path):
    """compact_chain folds the whole chain into one canonical shard:
    query-identical to the federated chain, fresh GLOBAL dedup
    artifacts (a dup of any old survivor is still caught), idempotent,
    and refused on a single-shard chain."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import donkey_ray.pipelines.ingest as ing

    state = str(tmp_path / "chain_c")
    for i, sid in enumerate(("s1", "s2", "s3")):
        ing.ingest_delta(state, shards[i], shard_id=sid)
    eng_before = ing.chain_engine(state)
    probe = [("uniqueonetoken3", 3), ("uniquetwotoken1", 3),
             ("twinword3", 5), ("s3d1word4", 5)]
    want = {q: eng_before.topk(q, k) for q, k in probe}

    m = ing.compact_chain(state)
    st = ing.load_state(state)
    assert st["shards"] == [m["shard_id"]]
    assert m["compacted_from"] == ["s1", "s2", "s3"]
    assert m["n_survivors"] == 12

    eng_after = ing.chain_engine(state)
    assert eng_after.n_docs == 12
    for (q, k), w in zip(probe, want.values()):
        assert eng_after.topk(q, k) == pytest.approx(w), q

    # idempotent: same member set -> same sid, instant return
    m2 = ing.compact_chain(state) if len(st["shards"]) >= 2 else None
    assert m2 is None  # single-shard chain refuses
    with pytest.raises(ValueError, match="nothing to compact"):
        ing.compact_chain(state)

    # the compacted GLOBAL artifacts still catch a dup of an s1-era doc
    dup = {"repo": "r", "path": "fresh.txt", "commit": "c9", "lang": "en",
           "content": _text("s1d4", "nearcopy")}
    p = str(tmp_path / "s4.parquet")
    pq.write_table(pa.table({k: pa.array([dup[k]], pa.string())
                             for k in dup}), p)
    m4 = ing.ingest_delta(state, p, shard_id="s4")
    assert m4["n_survivors"] == 0  # dropped against the compacted shard
    assert ing.chain_engine(state).n_docs == 12


def test_auto_compact_chain(ray_session, shards, tmp_path):
    """auto_compact_shards (VERDICT r4 item 4): the third ingest folds
    the chain as part of ingest_delta itself; queries AND subsequent
    probes are identical to an unfolded reference chain, and the policy
    is pinned like every other spec key."""
    import donkey_ray.pipelines.ingest as ing

    ref = str(tmp_path / "chain_ref")
    auto = str(tmp_path / "chain_auto")
    spec = {"auto_compact_shards": 3}
    metas = []
    for sid, p in zip(("s1", "s2", "s3"), shards):
        ing.ingest_delta(ref, p, shard_id=sid)
        metas.append(ing.ingest_delta(auto, p, shard_id=sid, spec=spec))
    # below the threshold nothing folds; at it, the ingest call does
    assert "auto_compacted_to" not in metas[0]
    assert "auto_compacted_to" not in metas[1]
    assert metas[2]["auto_compacted_to"].startswith("compact-")
    st = ing.load_state(auto)
    assert st["shards"] == [metas[2]["auto_compacted_to"]]

    # query parity vs the unfolded reference chain
    eng_ref, eng_auto = ing.chain_engine(ref), ing.chain_engine(auto)
    assert eng_auto.n_docs == eng_ref.n_docs == 12
    for q, k in (("uniqueonetoken3", 3), ("uniquetwotoken1", 3),
                 ("twinword3", 5), ("s3d1word4", 5)):
        assert eng_auto.topk(q, k) == pytest.approx(eng_ref.topk(q, k)), q

    # subsequent-probe parity: a 4th shard with a near-copy of an
    # s1-era doc plus one fresh doc resolves identically on both chains
    s4 = [_doc(40, _text("s1d4", "nearcopy")),
          _doc(41, _text("s4fresh", "uniquefourtoken"))]
    p4 = str(tmp_path / "s4.parquet")
    _write_shard(p4, s4)
    m_ref = ing.ingest_delta(ref, p4, shard_id="s4")
    m_auto = ing.ingest_delta(auto, p4, shard_id="s4", spec=spec)
    assert m_ref["n_survivors"] == m_auto["n_survivors"] == 1
    assert ing.chain_engine(auto).n_docs == ing.chain_engine(ref).n_docs
    got = ing.chain_engine(auto).topk("uniquefourtoken", 3)
    assert got and got == pytest.approx(
        ing.chain_engine(ref).topk("uniquefourtoken", 3))

    # a later client that disagrees with the pinned policy fails loudly
    with pytest.raises(ValueError, match="disagrees"):
        ing.ingest_delta(auto, p4, shard_id="s5",
                         spec={"auto_compact_shards": 7})


def test_auto_compact_resumes_after_crashed_fold(ray_session, shards,
                                                 tmp_path):
    """A fold that crashed between the done marker and the manifest
    swap (old chain still serving) is completed by the NEXT ingest call
    — including an idempotent replay of an already-done shard."""
    import hashlib

    import donkey_ray.pipelines.ingest as ing

    state = str(tmp_path / "chain_crash")
    spec = {"auto_compact_shards": 3}
    for sid, p in zip(("s1", "s2", "s3"), shards):
        m = ing.ingest_delta(state, p, shard_id=sid, spec=spec)
    csid = m["auto_compacted_to"]
    # simulate the crash window: marker written, manifest swap lost
    st = ing.load_state(state)
    assert st["shards"] == [csid]
    st["shards"] = ["s1", "s2", "s3"]
    from donkey_ray.state import manifest as mf

    mf.atomic_write_json(os.path.join(state, "manifest.json"), st)
    # replaying a done shard resumes the fold (same members, same sid)
    m2 = ing.ingest_delta(state, shards[2], shard_id="s3", spec=spec)
    assert m2["auto_compacted_to"] == csid
    assert ing.load_state(state)["shards"] == [csid]
    assert ing.chain_engine(state).n_docs == 12
