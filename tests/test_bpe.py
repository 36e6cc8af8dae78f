"""BPE tokenizer training conformance (pipelines/bpe.py).

The pinned spec (word counts -> char symbols -> per-round argmax pair +
greedy left-to-right merge) is checked against a brute-force sequential
reference, including the identical-pair overlap rule ("aaa" merges the
first two a's only), plus layout invariance and encode consistency.
"""

import random

import pyarrow as pa
import pytest


def _ref_merge(seq, a, b):
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def _ref_train(word_counts, num_merges):
    work = {w: list(w) for w in word_counts}
    merges = []
    for r in range(1, num_merges + 1):
        pcnt = {}
        for w, seq in work.items():
            c = word_counts[w]
            for i in range(len(seq) - 1):
                k = (seq[i], seq[i + 1])
                pcnt[k] = pcnt.get(k, 0) + c
        if not pcnt:
            break
        bc = max(pcnt.values())
        a, b = sorted(k for k, v in pcnt.items() if v == bc)[0]
        merges.append((r, a, b, bc))
        for w in work:
            work[w] = _ref_merge(work[w], a, b)
    return merges, work


def test_merge_kernel_matches_sequential_reference():
    from donkey_ray.pipelines.bpe import _apply_merge_batch

    rng = random.Random(7)
    for _ in range(300):
        words = ["".join(rng.choice("ab") for _ in range(rng.randint(1, 9)))
                 for _ in range(rng.randint(1, 5))]
        a, b = rng.choice("ab"), rng.choice("ab")
        batch = pa.table({
            "cnt": pa.array([1] * len(words), pa.int64()),
            "syms": pa.array([list(w) for w in words], pa.list_(pa.string())),
        })
        got = _apply_merge_batch(batch, a, b).column("syms").to_pylist()
        assert got == [_ref_merge(list(w), a, b) for w in words]


def test_char_lists_vectorized_split():
    from donkey_ray.pipelines.bpe import _char_lists

    arr = pa.array(["abc", "x", "q9z"])
    assert _char_lists(arr).to_pylist() == [["a", "b", "c"], ["x"],
                                            ["q", "9", "z"]]
    # sliced input (nonzero array offset) must still split correctly
    assert _char_lists(pa.array(["pad", "de"]).slice(1)).to_pylist() == [
        ["d", "e"]]


@pytest.fixture(scope="module")
def planted_corpus(ray_session):
    import ray.data

    # Zipf-ish word mix with deliberate overlap-heavy words (aaa, aaaa)
    rng = random.Random(11)
    vocab = ["aaa", "aaaa", "abab", "banana", "deed", "deeded",
             "loop", "pool", "x9", "zz"]
    docs = []
    for i in range(60):
        n = rng.randint(3, 25)
        docs.append(" ".join(rng.choice(vocab) for _ in range(n)))
    tbl = pa.table({"doc_id": pa.array(range(60), pa.int64()),
                    "text": pa.array(docs, pa.string())})
    return tbl, ray.data.from_arrow(tbl)


def test_bpe_train_matches_reference(planted_corpus):
    from donkey_ray.pipelines.bpe import bpe_train

    tbl, ds = planted_corpus
    wc = {}
    for t in tbl.column("text").to_pylist():
        for w in t.lower().split():
            wc[w] = wc.get(w, 0) + 1
    ref, _ = _ref_train(wc, 8)
    got = bpe_train(ds, num_merges=8)
    assert [tuple(r.values()) for r in got.to_pylist()] == ref


def test_bpe_train_layout_invariant(planted_corpus):
    import ray.data

    from donkey_ray.pipelines.bpe import bpe_train

    tbl, _ = planted_corpus
    a = bpe_train(ray.data.from_arrow(tbl).repartition(1), num_merges=5)
    b = bpe_train(ray.data.from_arrow(tbl).repartition(7), num_merges=5)
    assert a.to_pylist() == b.to_pylist()


def test_bpe_encode_counts_match_reference(planted_corpus):
    from donkey_ray.pipelines.bpe import bpe_encode_counts, bpe_train

    tbl, ds = planted_corpus
    wc = {}
    for t in tbl.column("text").to_pylist():
        for w in t.lower().split():
            wc[w] = wc.get(w, 0) + 1
    _, final = _ref_train(wc, 8)
    merges = bpe_train(ds, num_merges=8)
    got = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
           for r in bpe_encode_counts(ds, merges).take_all()}
    for i, t in enumerate(tbl.column("text").to_pylist()):
        words = t.lower().split()
        want = (len(words), sum(len(final[w]) for w in words))
        assert got[i] == want


def test_bpe_early_stop_when_no_pairs(ray_session):
    import ray.data

    from donkey_ray.pipelines.bpe import bpe_train

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a b c", "d e"], pa.string()),
    }))
    assert bpe_train(ds, num_merges=5).num_rows == 0
