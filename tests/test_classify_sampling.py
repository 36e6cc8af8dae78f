"""Naive-Bayes classifier, stratified split, and weighted sampling.

The driver's sf tables carry NO text<->lang signal (every lang shares
one vocabulary), so the NB driver query's value is oracle exactness;
the planted corpus here proves the classifier actually classifies when
signal exists (the kmeans planted-blob pattern).
"""

import numpy as np
import pyarrow as pa
import pytest

from donkey_ray.util import dataset_to_table


def _planted_docs(n=400):
    """Two classes with overlapping but shifted vocabularies: en docs
    draw 60% from vocab A, others 60% from vocab B (deterministic)."""
    rng = np.random.RandomState(7)
    va = [f"alpha{i}" for i in range(30)] + ["shared%d" % i for i in range(20)]
    vb = [f"beta{i}" for i in range(30)] + ["shared%d" % i for i in range(20)]
    rows = []
    for i in range(n):
        is_en = i % 3 != 0  # ~2/3 en
        v = va if is_en else vb
        toks = [v[rng.randint(0, 30)] if rng.rand() < 0.6
                else v[30 + rng.randint(0, 20)] for _ in range(40)]
        rows.append({"doc_id": i, "text": " ".join(toks),
                     "lang": "en" if is_en else "de"})
    return pa.Table.from_pylist(rows)


@pytest.fixture(scope="module")
def planted_ds(ray_session):
    import ray.data

    return ray.data.from_arrow(_planted_docs()).repartition(6)


def test_nb_classifies_planted_corpus(planted_ds):
    from donkey_ray.pipelines.classify import nb_confusion, nb_scores, nb_train

    model = nb_train(planted_ds)
    conf = nb_confusion(nb_scores(planted_ds, model))
    d = {(r["actual"], r["pred"]): r["n"] for r in conf.to_pylist()}
    total = sum(d.values())
    acc = (d[(0, 0)] + d[(1, 1)]) / total
    assert total == 200  # odd doc_ids
    assert acc > 0.9, d


def test_nb_layout_invariance(planted_ds):
    import ray.data

    from donkey_ray.pipelines.classify import nb_scores, nb_train

    tbl = _planted_docs()
    a = ray.data.from_arrow(tbl).repartition(2)
    b = ray.data.from_arrow(tbl).repartition(9)
    sa = dataset_to_table(nb_scores(a, nb_train(a))).sort_by("doc_id")
    sb = dataset_to_table(nb_scores(b, nb_train(b))).sort_by("doc_id")
    assert sa.equals(sb)
    # holdout only, and every holdout doc scored (prior-only for empties)
    assert sa.num_rows == 200
    assert all(i % 2 == 1 for i in sa.column("doc_id").to_pylist())


def test_nb_tokenless_doc_scores_prior(ray_session):
    import ray.data

    from donkey_ray.pipelines.classify import nb_scores, nb_train

    rows = [{"doc_id": i, "text": "alpha word" if i % 2 == 0 else "",
             "lang": "en" if i % 4 < 2 else "de"} for i in range(8)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    model = nb_train(ds)
    out = dataset_to_table(nb_scores(ds, model))
    # all holdout docs have empty text -> score == prior exactly
    assert set(out.column("score_x1e6").to_pylist()) == {model["prior"]}


def test_stratified_split_exact_proportions(ray_session):
    import ray.data

    from donkey_ray.pipelines.sampling import stratified_split

    rows = [{"doc_id": i, "lang": "en" if i % 5 else "de"}
            for i in range(1000)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(7)
    out = dataset_to_table(stratified_split(ds))
    assert out.num_rows == 1000
    import collections

    c = collections.Counter(
        zip(out.column("lang").to_pylist(), out.column("split").to_pylist()))
    # en stratum: 800 rows -> exactly 640/80/80; de: 200 -> 160/20/20
    assert c[("en", "train")] == 640 and c[("en", "val")] == 80
    assert c[("de", "train")] == 160 and c[("de", "test")] == 20
    # layout-independent
    out2 = dataset_to_table(
        stratified_split(ray.data.from_arrow(pa.Table.from_pylist(rows))))
    assert (sorted(map(tuple, out.to_pylist()[0].items()))
            is not None)  # smoke shape
    a = sorted(out.to_pylist(), key=lambda r: r["doc_id"])
    b = sorted(out2.to_pylist(), key=lambda r: r["doc_id"])
    assert a == b


def test_weighted_sample_matches_bruteforce_and_respects_weights(ray_session):
    import ray.data

    from donkey_ray.functions.hashing import splitmix64
    from donkey_ray.pipelines.sampling import weighted_sample

    n = 500
    ids = np.arange(n, dtype=np.int64)
    w = np.where(ids < 50, 10_000, 10).astype(np.int64)  # 50 heavy docs
    tbl = pa.table({"doc_id": pa.array(ids), "n_chars": pa.array(w)})
    ds = ray.data.from_arrow(tbl).repartition(5)
    out = weighted_sample(ds, k=40)
    assert out.num_rows == 40
    # brute force the pinned spec on the driver
    z = splitmix64(ids.astype(np.uint64))
    u = (z.astype(np.float64) + 1.0) / 2.0**64
    num = np.floor(-np.log(u) * 1_000_000 + 0.5).astype(np.int64)
    ekey = (num * 1_000_000) // w
    sel = np.lexsort((ids, ekey))[:40]
    assert out.column("doc_id").to_pylist() == list(ids[sel])
    assert out.column("ekey").to_pylist() == list(ekey[sel])
    # weight dominance: the 1000x-heavier docs should dominate the sample
    heavy = sum(1 for d in out.column("doc_id").to_pylist() if d < 50)
    assert heavy >= 30, heavy


def test_grouped_split_null_group_and_k0_topk(ray_session):
    """REGRESSION (review findings): NULL group keys land in 'test'
    (matching the SQL CASE ELSE) instead of crashing the dictionary
    index path; topk_order with k=0 returns empty instead of raising."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from donkey_ray.functions.scoring import topk_order
    from donkey_ray.pipelines.sampling import grouped_split

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "source": pa.array(["a", None, "b"], pa.string())})
    out = grouped_split(ray.data.from_arrow(t)).take_all()
    by_id = {r["doc_id"]: r["split"] for r in out}
    assert by_id[2] == "test"
    assert set(by_id.values()) <= {"train", "val", "test"}
    assert list(topk_order(np.array([5, 3]), np.array([1.0, 2.0]), 0)) == []
