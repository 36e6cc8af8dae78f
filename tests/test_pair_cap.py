"""Degenerate-bucket stress tests (VERDICT r4 item 1).

A boilerplate-heavy corpus puts q near-identical docs into the same LSH
bucket in every band; uncapped enumeration is O(q^2) pairs inside one
partition task. These tests push >=10k identical / near-identical docs
through the minhash, simhash and embedding near-dup families and assert
(a) BOUNDED pair counts (O(q) star / O(cap^2) head, never O(q^2)) and
(b) the transitive closure the cluster consumers rely on is intact
(every doc lands in the one expected connected component).

Sub-cap behavior is bit-identical to the old full-triu enumeration, so
every pre-existing oracle stays green — verified separately by the
driver-contract suite at sf0.01.
"""

import numpy as np
import pyarrow as pa
import pytest

from donkey_ray.util import dataset_to_table


# ---------------- unit level: the cap + collapse kernels ----------------


def test_capped_pair_indices_subcap_identical():
    from donkey_ray.pipelines.dedup import _capped_pair_indices

    for m in (2, 3, 17, 64):
        ai, bi = _capped_pair_indices(m, cap=64)
        ei, ej = np.triu_indices(m, k=1)
        assert np.array_equal(ai, ei) and np.array_equal(bi, ej)


def test_capped_pair_indices_oversized_star():
    from donkey_ray.pipelines.dedup import _capped_pair_indices

    cap = 8
    m = 20
    ai, bi = _capped_pair_indices(m, cap=cap)
    n_tri = cap * (cap - 1) // 2
    assert len(ai) == n_tri + (m - cap)  # bounded: O(cap^2 + m)
    # head: the full upper triangle over ranks < cap
    assert np.array_equal(ai[:n_tri], np.triu_indices(cap, k=1)[0])
    # tail: star edges rank-0 -> rank-i, i >= cap (keeps run connected)
    assert (ai[n_tri:] == 0).all()
    assert np.array_equal(bi[n_tri:], np.arange(cap, m))
    # deterministic (pure function of m)
    ai2, bi2 = _capped_pair_indices(m, cap=cap)
    assert np.array_equal(ai, ai2) and np.array_equal(bi, bi2)


def test_collapse_run_by_sig():
    from donkey_ray.pipelines.dedup import _collapse_run_by_sig

    ids = np.array([7, 3, 9, 4, 8, 1], dtype=np.int64)
    sigs = np.array([10, 10, 20, 10, 20, 30], dtype=np.uint64)
    reps, rsigs, sa, sb = _collapse_run_by_sig(ids, sigs)
    rep_of = dict(zip(rsigs.tolist(), reps.tolist()))
    assert rep_of == {10: 3, 20: 8, 30: 1}  # min doc_id per signature
    stars = set(zip(sa.tolist(), sb.tolist()))
    assert stars == {(3, 4), (3, 7), (8, 9)}  # rep -> clone, rep < clone


# ---------------- pipeline level: >=10k clones stay bounded ----------------

N_CLONES = 10_000
_TEXT = "the quick brown fox jumps over the lazy dog again and again"


def _clone_ds(n=N_CLONES, text=_TEXT):
    import ray.data

    return ray.data.from_arrow(
        pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array([text] * n),
        })
    )


def test_minhash_clone_flood_bounded_and_connected(ray_session):
    from donkey_ray.pipelines.components import connected_components
    from donkey_ray.pipelines.dedup import minhash_neardup_pairs

    pairs = minhash_neardup_pairs(_clone_ds(), n=3, threshold=0.5)
    tbl = dataset_to_table(pairs)
    # identical signatures collapse to ONE representative per bucket ->
    # exactly the q-1 star edges (uncapped would be ~5e7 pairs)
    assert tbl.num_rows == N_CLONES - 1
    assert set(tbl.column("doc_a").to_pylist()) == {0}
    assert set(tbl.column("doc_b").to_pylist()) == set(range(1, N_CLONES))
    assert all(j == 1.0 for j in tbl.column("jaccard").to_pylist())
    cc = dataset_to_table(
        connected_components(pairs.select_columns(["doc_a", "doc_b"])))
    assert cc.num_rows == N_CLONES
    assert set(cc.column("cluster_id").to_pylist()) == {0}
    assert set(cc.column("cluster_size").to_pylist()) == {N_CLONES}


def test_minhash_near_identical_groups_closure(ray_session):
    """4 mutually-similar texts x 3000 copies: clone groups collapse to
    reps, reps still pair up across groups, closure = ONE 12k cluster."""
    import ray.data

    from donkey_ray.pipelines.components import connected_components
    from donkey_ray.pipelines.dedup import minhash_neardup_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam"
    texts = [base + " " + t for t in ("mu", "nu", "xi", "omicron")]
    n_per = 3_000
    n = n_per * len(texts)
    ds = ray.data.from_arrow(
        pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            # round-robin so clone groups span input blocks
            "text": pa.array([texts[i % len(texts)] for i in range(n)]),
        })
    )
    tbl = dataset_to_table(minhash_neardup_pairs(ds, n=3, threshold=0.5))
    # bounded: 4 clone-group stars (n - 4 edges) + <= C(4,2) rep pairs
    assert n - 4 <= tbl.num_rows <= n - 4 + 6
    cc = dataset_to_table(connected_components(
        ray.data.from_arrow(tbl.select(["doc_a", "doc_b"]))))
    assert cc.num_rows == n
    assert set(cc.column("cluster_id").to_pylist()) == {0}


def test_simhash_clone_flood_bounded(ray_session):
    from donkey_ray.pipelines.dedup import simhash_neardup_pairs

    tbl = dataset_to_table(simhash_neardup_pairs(_clone_ds(), max_hamming=3))
    assert tbl.num_rows == N_CLONES - 1
    assert set(tbl.column("doc_a").to_pylist()) == {0}
    assert set(tbl.column("doc_b").to_pylist()) == set(range(1, N_CLONES))
    assert set(tbl.column("min(hamming)").to_pylist()) == {0}


def test_embedding_clone_flood_bounded(ray_session):
    import ray.data

    from donkey_ray.pipelines.ann import embedding_neardup_pairs
    from donkey_ray.pipelines.dedup import PAIR_ENUM_CAP

    n = 5_000
    vec = np.ones(8, dtype=np.float64)
    ds = ray.data.from_arrow(
        pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "vec": pa.array([vec.tolist()] * n,
                            type=pa.list_(pa.float64())),
        })
    )
    tbl = embedding_neardup_pairs(ds, id_col="vec_id", vec_col="vec",
                                  threshold=0.99, exact=False)
    # all vectors identical -> one bucket per table; capped head clique
    # + rank-0 star tail, identical across tables -> exactly this count
    want = PAIR_ENUM_CAP * (PAIR_ENUM_CAP - 1) // 2 + (n - PAIR_ENUM_CAP)
    assert tbl.num_rows == want  # uncapped would be C(5000,2) = 12.5M
    ids_seen = set(tbl.column("vec_a").to_pylist()) | set(
        tbl.column("vec_b").to_pylist())
    assert ids_seen == set(range(n))  # star keeps every clone reachable
    assert all(s == pytest.approx(1.0) for s in
               tbl.column("cos_sim").to_pylist()[:100])


# ---------------- property level (hypothesis, no Ray) ----------------


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(m=st.integers(2, 400), cap=st.integers(2, 64))
def test_capped_pairs_connectivity_and_bound(m, cap):
    """For ANY run size and cap: the emitted pair set (a) stays within
    the documented bound cap*(cap-1)/2 + max(0, m-cap), (b) connects
    ALL m members into one component (the property the
    transitive-closure consumers rely on), and (c) equals the full
    upper triangle exactly when m <= cap."""
    from donkey_ray.pipelines.dedup import _capped_pair_indices

    ai, bi = _capped_pair_indices(m, cap=cap)
    n_tri = cap * (cap - 1) // 2
    assert len(ai) == len(bi) <= n_tri + max(0, m - cap)
    assert (ai < bi).all()  # a < b everywhere (rank order)
    if m <= cap:
        ei, ej = np.triu_indices(m, k=1)
        assert np.array_equal(ai, ei) and np.array_equal(bi, ej)
    parent = list(range(m))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(ai.tolist(), bi.tolist()):
        parent[find(a)] = find(b)
    assert len({find(x) for x in range(m)}) == 1


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 10**6), st.integers(0, 7)),
                min_size=1, max_size=200, unique_by=lambda t: t[0]))
def test_collapse_run_by_sig_properties(pairs):
    """For ANY (id, sig) run: reps are the min id per distinct sig,
    star edges cover exactly the clones (rep < clone), the output is
    invariant under input permutation (determinism), and
    reps + clones partition the input ids."""
    from donkey_ray.pipelines.dedup import _collapse_run_by_sig

    ids = np.array([p[0] for p in pairs], dtype=np.int64)
    sigs = np.array([p[1] for p in pairs], dtype=np.uint64)
    reps, rsigs, sa, sb = _collapse_run_by_sig(ids, sigs)

    want_rep = {}
    for i, g in zip(ids.tolist(), sigs.tolist()):
        want_rep[g] = min(want_rep.get(g, i), i)
    assert dict(zip(rsigs.tolist(), reps.tolist())) == want_rep
    assert (sa < sb).all() if len(sa) else True
    assert set(reps.tolist()) | set(sb.tolist()) == set(ids.tolist())
    assert set(reps.tolist()).isdisjoint(sb.tolist())
    for a, b, g in zip(sa.tolist(), sb.tolist(),
                       [dict(zip(ids.tolist(), sigs.tolist()))[b]
                        for b in sb.tolist()]):
        assert a == want_rep[g]  # every clone stars to ITS group's rep

    # permutation invariance
    perm = np.random.default_rng(0).permutation(len(ids))
    r2, g2, a2, b2 = _collapse_run_by_sig(ids[perm], sigs[perm])
    assert sorted(zip(r2.tolist(), g2.tolist())) == sorted(
        zip(reps.tolist(), rsigs.tolist()))
    assert sorted(zip(a2.tolist(), b2.tolist())) == sorted(
        zip(sa.tolist(), sb.tolist()))
