"""Content-trigram grep: candidate completeness, indexed == scan
equivalence, mandatory-literal extraction, and artifact resume."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from donkey_ray.pipelines import grep

DOCS = [
    (0, "The quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs"),
    (2, "a quick movement of the enemy will jeopardize five gunboats"),
    (3, "sphinx of black quartz judge my vow"),
    (4, "how quickly daft jumping zebras vex"),
    (5, "aaaa aa repeated aa overlap test aaaa"),
    (6, ""),
    (7, "unicode café naïve 中文 content"),
]


@pytest.fixture(scope="module")
def grep_index(ray_session, tmp_path_factory):
    import ray.data

    root = str(tmp_path_factory.mktemp("grep"))
    docs_path = os.path.join(root, "documents.parquet")
    tbl = pa.table({
        "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
        "text": pa.array([t for _, t in DOCS], pa.string()),
    })
    pq.write_table(tbl, docs_path)
    out = os.path.join(root, "grepidx")
    grep.build_content_trigram_index(
        ray.data.read_parquet(docs_path), out
    )
    return docs_path, out


def _scan_hits(pat: str) -> dict[int, int]:
    p = pat.lower()
    return {d: t.lower().count(p) for d, t in DOCS if p in t.lower()}


def test_candidates_are_a_superset(grep_index):
    _, idx = grep_index
    for pat in ["quick", "aaaa", "café", "five", "zzz absent", "ove"]:
        cand = grep.substring_candidates(idx, pat.lower())
        assert cand is not None
        assert set(_scan_hits(pat)) <= set(cand.tolist()), pat


def test_substring_search_exact(grep_index, ray_session):
    import ray.data

    docs_path, idx = grep_index
    pats = [(0, "quick"), (1, "aa"), (2, "ZZZ"), (3, "café"),
            (4, "e q")]
    res = grep.substring_search(
        ray.data.read_parquet(docs_path), idx, pats, docs_path=docs_path
    )
    got = {
        (r["pattern_id"], r["doc_id"]): r["n_hits"]
        for r in res.to_pylist()
    }
    want = {}
    for pid, pat in pats:
        for d, n in _scan_hits(pat).items():
            want[(pid, d)] = n
    assert got == want


def test_absent_gram_proves_empty_without_reads(grep_index):
    _, idx = grep_index
    cand = grep.substring_candidates(idx, "zzzqqq")
    assert cand is not None and len(cand) == 0


def test_short_pattern_falls_back(grep_index):
    _, idx = grep_index
    assert grep.substring_candidates(idx, "qu") is None


@pytest.mark.parametrize("pat,lit", [
    ("value[sd]?", "value"),
    ("wind[aeiou]w", "wind"),
    ("spa+rk", "spa"),         # 'a+' needs >=1 'a', so 'spa' is mandatory
    ("s(can|ort)", None),      # groups/alternation -> conservative None
    ("qu..y", None),
    ("zzznope[0-9]*", "zzznope"),
    ("abc\\d+def", None),      # escape breaks runs; both len-3 -> 'abc'
    # {m,n} bodies are NOT literal text: '2,3' must never be returned
    ("ab{2,3}cde", "cde"),
    ("window{2,10}", "windo"),  # 'w{' excludes the w; '{...}' skipped
    ("ab{2,3}cd", None),        # surviving runs all < 3 chars
])
def test_mandatory_literal(pat, lit):
    got = grep.mandatory_literal(pat)
    if pat == "abc\\d+def":
        assert got in ("abc", "def")
    else:
        assert got == lit


def test_regex_indexed_equals_scan(grep_index, ray_session):
    import ray.data

    from donkey_ray.pipelines.analyze import regex_search
    from donkey_ray.util import dataset_to_table

    docs_path, idx = grep_index
    pats = [(0, "qui[ck]+"), (1, "ju[md]"), (2, "a{2,}"),
            (3, "zzznope[0-9]*"), (4, "quick[a-z]*y?")]
    ds = ray.data.read_parquet(docs_path)
    got = grep.regex_search_indexed(ds, idx, pats, docs_path=docs_path)
    want = (
        dataset_to_table(regex_search(ds, pats))
        .sort_by([("pattern_id", "ascending"), ("doc_id", "ascending")])
    )
    assert got.to_pylist() == want.to_pylist()


def test_build_is_marker_resumable(grep_index, ray_session):
    import ray.data

    docs_path, idx = grep_index
    before = sorted(os.listdir(idx))
    grep.build_content_trigram_index(ray.data.read_parquet(docs_path), idx)
    assert sorted(os.listdir(idx)) == before  # _DONE short-circuits


def test_gram_df_matches_postings(grep_index):
    import pyarrow.dataset as pads

    _, idx = grep_index
    files = [os.path.join(idx, f) for f in sorted(os.listdir(idx))
             if f.startswith("postings-")]
    post = pads.dataset(files).to_table()
    want = post.group_by("gram").aggregate([("doc_id", "count")])
    want = dict(zip(want.column("gram").to_pylist(),
                    want.column("doc_id_count").to_pylist()))
    vocab, dfs = grep._gram_df(idx)
    got = dict(zip(vocab.tolist(), dfs.tolist()))
    assert got == want
