"""Deduplication pipelines (SURVEY.md B21 + training-data ops):
exact sha256, n-gram Jaccard, MinHash+LSH, SimHash.

Partitioning notes (scale path, 10^12 rows):
  - exact: shuffle only the (hash, id) projection, never the payload; the
    winner set is re-applied as a broadcast semi-join filter (pc.is_in),
    or as a hash-partitioned semi-join when the winner set itself is big.
  - minhash/jaccard: candidate generation is a groupby on band/shingle
    keys (bounded group sizes by construction); pair VERIFICATION is a
    two-stage keyed cogroup join (pairs x per-doc shingle sets) — no
    whole-corpus map is ever built on the driver or broadcast.
"""

from __future__ import annotations


import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions import minhash as mh
from ..functions.hashing import sha256_hex_column
from ..stages.exchange import (
    keyed_cogroup_map,
    keyed_partition_map,
    partitioned_aggregate,
)
from ..util import dataset_to_table


def add_content_hash(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    def f(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "content_sha256", sha256_hex_column(batch.column(text_col))
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def exact_dedup_groups(
    ds: ray.data.Dataset, *, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """(content_sha256, doc_id=min id, n_dups) per distinct content.

    Shuffles only the 2-column (hash, id) projection (SURVEY.md B21);
    per-partition C++ hash aggregation via keyed exchange."""
    hashed = add_content_hash(ds, text_col).select_columns(["content_sha256", id_col])
    return partitioned_aggregate(
        hashed,
        ["content_sha256"],
        [(id_col, "min"), (id_col, "count")],
        rename={f"{id_col}_min": "doc_id", f"{id_col}_count": "n_dups"},
    )


def exact_dedup(
    ds: ray.data.Dataset, *, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Rows of ``ds`` surviving exact dedup (keep min id per content hash),
    applied as a broadcast winner-set ``pc.is_in`` filter — the full rows
    never shuffle. The winner set is an Arrow array shipped once per worker
    (ray.put); use ``exact_dedup_semijoin`` when the winner set itself is
    too large to broadcast (winner count ~ n_distinct_docs)."""
    winners = dataset_to_table(
        exact_dedup_groups(ds, text_col=text_col, id_col=id_col)
    ).column("doc_id").combine_chunks()
    winner_ref = ray.put(winners)

    def keep(batch: pa.Table) -> pa.Table:
        win = ray.get(winner_ref)
        return batch.filter(pc.is_in(batch.column(id_col), value_set=win))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def exact_dedup_semijoin(
    ds: ray.data.Dataset, *, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Scale-path exact dedup: hash-partitioned semi-join of the full rows
    against the winner-id set (one keyed exchange each side, no broadcast;
    winner-set size is unbounded). Same output rows as ``exact_dedup``."""
    winners = exact_dedup_groups(ds, text_col=text_col, id_col=id_col)

    def winner_ids(batch: pa.Table) -> pa.Table:
        return pa.table({"__win_id": batch.column("doc_id").cast(pa.int64())})

    win_ds = winners.map_batches(
        winner_ids, batch_format="pyarrow", zero_copy_batch=True
    )

    def semi(rows: pa.Table, win: pa.Table) -> pa.Table:
        return rows.filter(
            pc.is_in(rows.column(id_col), value_set=win.column("__win_id").combine_chunks())
        )

    return keyed_cogroup_map(ds, win_ds, [id_col], ["__win_id"], semi)


def doc_shingle_sets(
    ds: ray.data.Dataset, *, text_col: str = "text", id_col: str = "doc_id",
    n: int = 3,
) -> ray.data.Dataset:
    """(doc_id, hashes:list<uint64>) — each doc's sorted distinct shingle
    hash set (empty list for docs with < n tokens)."""

    from ..functions.textstats import shingle_hash_column

    def f(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        values, offsets = shingle_hash_column(col, n)
        hashes = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(values, pa.uint64())
        )
        return pa.table(
            {"doc_id": batch.column(id_col).cast(pa.int64()), "hashes": hashes}
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _list_column_slices(col) -> tuple[np.ndarray, np.ndarray]:
    """list<uint64> column -> (values, offsets) numpy views (no to_pylist)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    values = col.values.to_numpy(zero_copy_only=False).astype(np.uint64)
    offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return values, offsets


def _set_lookup(sets: pa.Table):
    """Sorted-id lookup structure over a (doc_id, hashes) partition."""
    ids = sets.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    values, offsets = _list_column_slices(sets.column("hashes"))
    return ids[order], order, values, offsets


def _gather_lists(lookup, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """For each key (doc_id) return its hash-set slice, concatenated:
    (values, out_offsets). Vectorized gather over the partition's buffers."""
    sorted_ids, order, values, offsets = lookup
    pos = np.searchsorted(sorted_ids, keys)
    if len(sorted_ids) == 0:
        if len(keys):
            raise KeyError(
                f"doc ids missing from shingle-set side: {keys[:5]}")
    elif not np.array_equal(
        clamped := sorted_ids[np.minimum(pos, len(sorted_ids) - 1)], keys
    ):
        missing = keys[(pos >= len(sorted_ids)) | (clamped != keys)]
        raise KeyError(f"doc ids missing from shingle-set side: {missing[:5]}")
    rows = order[pos]
    starts = offsets[rows]
    lens = offsets[rows + 1] - starts
    total = int(lens.sum())
    out_offsets = np.concatenate(([0], np.cumsum(lens)))
    if total == 0:
        return np.empty(0, np.uint64), out_offsets
    rel = np.arange(total, dtype=np.int64) - np.repeat(out_offsets[:-1], lens)
    return values[np.repeat(starts, lens) + rel], out_offsets


def _verify_pairs_distributed(
    cand: ray.data.Dataset,
    sets: ray.data.Dataset,
    threshold: float,
    *,
    cache_sets: bool = True,
    sets_b: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Exact-Jaccard verification of candidate pairs WITHOUT materializing
    any whole-corpus state: a two-stage keyed cogroup join. Stage A
    dedupes candidates (every copy of a pair co-locates: the key is a)
    and attaches doc_a's shingle set; stage B re-keys by b, attaches
    doc_b's set and scores the pair in the partition task. Per-task
    memory = one hash partition of pairs + one hash partition of doc
    sets.

    Symmetric case (one corpus): ``sets`` feeds BOTH stages; with
    cache_sets (default) it is materialized once into the (spillable)
    object store — ~2x faster than re-running the shingle-hash map per
    stage; pass cache_sets=False at extremes where spill I/O would cost
    more than recomputing the shingles. Asymmetric case (incremental
    dedup — every pair is (corpus a, delta b)): pass ``sets_b``; stage A
    then shuffles only the a-side sets and stage B only the b-side,
    halving set exchange volume."""
    if sets_b is None:
        if cache_sets:
            sets = sets.materialize()
        sets_b = sets

    def attach_a(pairs: pa.Table, part_sets: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "hashes": pa.array([], pa.list_(pa.uint64()))})
        if pairs.num_rows == 0:
            return empty
        # candidate generators may emit a pair several times (several
        # shared shingles / bands); all copies land here -> dedup now
        pairs = pairs.group_by(["a", "b"], use_threads=False).aggregate([])
        a = pairs.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        lookup = _set_lookup(part_sets)
        values, out_off = _gather_lists(lookup, a)
        hashes = pa.ListArray.from_arrays(
            pa.array(out_off, pa.int32()), pa.array(values, pa.uint64())
        )
        return pa.table({"a": pairs.column("a"), "b": pairs.column("b"),
                         "hashes": hashes})

    stage_a = keyed_cogroup_map(cand, sets, ["a"], ["doc_id"], attach_a)

    def verify_b(pairs: pa.Table, part_sets: pa.Table) -> pa.Table:
        """Scores every pair against doc_b's set with NO per-pair Python:
        pairs are grouped by b, and for each distinct b ONE vectorized
        searchsorted of all its pairs' concatenated a-hashes against hb
        yields the intersection counts via a segment sum."""
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "jaccard": pa.array([], pa.float64())})
        if pairs.num_rows == 0:
            return empty
        a = pairs.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = pairs.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        ha_vals, ha_off = _list_column_slices(pairs.column("hashes"))
        na = np.diff(ha_off)
        sorted_ids, order, values, offsets = _set_lookup(part_sets)
        n_pairs = len(a)
        inter = np.zeros(n_pairs, dtype=np.int64)
        nb = np.zeros(n_pairs, dtype=np.int64)
        bo = np.argsort(b, kind="stable")
        b_s = b[bo]
        run_starts = np.concatenate(
            ([0], np.flatnonzero(b_s[1:] != b_s[:-1]) + 1)
        )
        run_ends = np.concatenate((run_starts[1:], [n_pairs]))
        for s, e in zip(run_starts, run_ends):
            sel = bo[s:e]
            pos_b = int(np.searchsorted(sorted_ids, b_s[s]))
            if pos_b >= len(sorted_ids) or sorted_ids[pos_b] != b_s[s]:
                raise KeyError(f"doc id {b_s[s]} missing from shingle-set side")
            row = order[pos_b]
            hb = values[offsets[row]: offsets[row + 1]]
            nb[sel] = len(hb)
            lens = na[sel]
            tot = int(lens.sum())
            if tot == 0 or len(hb) == 0:
                continue
            out_off = np.concatenate(([0], np.cumsum(lens)))
            rel = np.arange(tot, dtype=np.int64) - np.repeat(out_off[:-1], lens)
            vals = ha_vals[np.repeat(ha_off[sel], lens) + rel]
            p = np.searchsorted(hb, vals)
            found = (p < len(hb)) & (hb[np.minimum(p, len(hb) - 1)] == vals)
            inter[sel] = np.bincount(
                np.repeat(np.arange(len(sel)), lens), weights=found,
                minlength=len(sel),
            ).astype(np.int64)
        union = na + nb - inter
        with np.errstate(invalid="ignore"):
            jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        keep = jac >= threshold
        if not keep.any():
            return empty
        return pa.table(
            {
                "doc_a": pa.array(a[keep], pa.int64()),
                "doc_b": pa.array(b[keep], pa.int64()),
                "jaccard": pa.array(jac[keep], pa.float64()),
            }
        )

    return keyed_cogroup_map(stage_a, sets_b, ["b"], ["doc_id"], verify_b)


def _explode_shingle_hashes(
    batch: pa.Table, text_col: str, id_col: str, n: int
) -> pa.Table:
    """(shingle:uint64, doc_id) rows — one per DISTINCT shingle per doc,
    via the vectorized column kernel (no per-doc Python)."""
    from ..functions.textstats import shingle_hash_column

    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    values, offsets = shingle_hash_column(col, n)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "shingle": pa.array(values, pa.uint64()),
            "doc_id": pa.array(np.repeat(ids, np.diff(offsets)), pa.int64()),
        }
    )


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 1,
    threshold: float = 0.5,
    prefix_filter: bool = True,
    dense_vocab_max: int | None = None,
) -> ray.data.Dataset:
    """Exact all-pairs n-gram Jaccard >= threshold.

    With ``prefix_filter`` (default, PPJoin-style): J(A,B) >= t implies the
    pair shares a shingle among the |A| - ceil(t|A|) + 1 GLOBALLY RAREST
    shingles of each doc, so candidate pairs are generated only from those
    prefix lists — ubiquitous shingles ('the', common keywords) never
    explode into all-pairs. Candidates are then verified with the exact
    Jaccard via the distributed cogroup join (_verify_pairs_distributed).
    Result set is IDENTICAL to the brute-force inverted-index variant
    (prefix_filter=False), which the DuckDB oracle mirrors."""
    if prefix_filter:
        return _ngram_jaccard_prefix(
            ds, text_col=text_col, id_col=id_col, n=n, threshold=threshold,
            dense_vocab_max=(DENSE_VOCAB_MAX if dense_vocab_max is None
                             else dense_vocab_max),
        )
    return _ngram_jaccard_bruteforce(
        ds, text_col=text_col, id_col=id_col, n=n, threshold=threshold
    )


_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)

# the pair-result schema shared by every jaccard variant, for the
# degenerate-corpus early returns
_EMPTY_PAIR_TABLE = pa.table({
    "doc_a": pa.array([], pa.int64()),
    "doc_b": pa.array([], pa.int64()),
    "jaccard": pa.array([], pa.float64()),
})

# dense-bitset dispatch ceiling: below this many distinct shingles the
# all-pairs bitset tiles beat candidate generation (most pairs genuinely
# qualify and prefix filtering cannot prune); W = vocab/64 words per doc
DENSE_VOCAB_MAX = 4096

# ---- degenerate-bucket guard (SCALE.md; VERDICT r4 item 1) -----------
#
# A boilerplate-heavy corpus (license headers, generated files, crawl
# mirrors) can put q near-identical docs into ONE band / shingle bucket
# in every band; full np.triu enumeration is then O(q^2) pairs inside a
# single partition task (q = 1e5 -> ~5e9 pairs, x32 bands). Every
# pair-emitting run loop therefore routes through
# _capped_pair_indices(m):
#   m <= cap : full upper-triangle pairs — bit-identical to the uncapped
#              enumeration, so existing oracles (sf <= 0.1 buckets are
#              orders of magnitude below the cap) never move;
#   m >  cap : full pairs among the cap lowest-ranked members PLUS star
#              edges rank-0 -> rank-i for the tail. Run members are
#              ranked by ascending doc_id (already the partition sort
#              key), so N-CPU and 4N-CPU runs emit IDENTICAL pairs.
# The star keeps an oversized bucket CONNECTED, which is the property
# the transitive-closure consumers (dedup_clusters / dedup_survivors /
# canonical mapping) rely on; emitted pair VALUES stay exact wherever a
# downstream verifier re-scores candidates (exact Jaccard cogroup join,
# per-pair hamming check, cosine). What is sacrificed above the cap is
# recall of individual tail-tail pairs — bounded per-task work is the
# point, and for the dominant degenerate case (exact/near-exact clones)
# the star edges verify at Jaccard ~1.0 so the closure is unchanged.
# The one value-level caveat: _ngram_jaccard_bruteforce accumulates
# per-shingle partial intersection counts across runs, so above the cap
# its non-star pair counts are UNDER-counted (threshold filter only gets
# stricter — no false positives); the scale path (PPJoin prefix) and the
# LSH families verify exactly and carry no such caveat.
PAIR_ENUM_CAP = 1024

# Inside an oversized run, members sharing an identical signature (the
# minhash 'sig64' column / the simhash fingerprint itself) are
# pre-collapsed to their lowest-doc_id representative before
# enumeration (_collapse_run_by_sig): clones enter the capped
# enumeration ONCE, star edges (rep -> clone) keep them in the closure,
# and the cap budget is spent on DISTINCT signatures instead of 1024
# copies of the same license header. Applied only when m > cap so
# sub-cap output stays bit-identical.


def _capped_pair_indices(m: int, cap: int = PAIR_ENUM_CAP):
    """(ai, bi) local-rank index pairs for a run of m members (see the
    PAIR_ENUM_CAP contract above). int64 arrays; ai < bi everywhere for
    the triu part, ai == 0 for the star tail."""
    if m <= cap:
        return np.triu_indices(m, k=1)
    ai, bi = np.triu_indices(cap, k=1)
    tail = np.arange(cap, m, dtype=np.int64)
    return (
        np.concatenate([ai.astype(np.int64), np.zeros(len(tail), np.int64)]),
        np.concatenate([bi.astype(np.int64), tail]),
    )


def _collapse_run_by_sig(ids: np.ndarray, sigs: np.ndarray):
    """Pre-collapse an OVERSIZED run's members by identical signature.

    Returns (rep_ids, rep_sigs, star_a, star_b): one representative
    (min doc_id) per distinct signature with its signature, plus
    rep->clone star edges for the collapsed members. Deterministic:
    ranks come from (sig, id) lexsort. A sig64 collision between
    non-identical docs merely mis-groups them into one star — every
    star edge is still re-verified downstream, so correctness is
    unaffected (only candidate recall for the collided doc, at 2^-64
    probability)."""
    o = np.lexsort((ids, sigs))
    sid, ssig = ids[o], sigs[o]
    first = np.concatenate(([True], ssig[1:] != ssig[:-1]))
    reps, rsigs = sid[first], ssig[first]
    group_of = np.cumsum(first) - 1
    clones = ~first
    return reps, rsigs, reps[group_of[clones]], sid[clones]


def _popcount64(x: np.ndarray) -> np.ndarray:
    return _POPCOUNT8[x.view(np.uint8).reshape(*x.shape, 8)].sum(axis=-1)


def _bitset_rows(batch: pa.Table, vocab_arr: np.ndarray, *, text_col: str,
                 id_col: str, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(ids, (rows x W) uint64 bitset matrix) for one batch: bit j set
    iff the doc contains sorted-vocab shingle j. Vectorized scatter."""
    from ..functions.textstats import shingle_hash_column

    W = (len(vocab_arr) + 63) // 64
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    values, offsets = shingle_hash_column(col, n)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    m = np.zeros((batch.num_rows, W), dtype=np.uint64)
    if len(values):
        rows = np.repeat(np.arange(batch.num_rows), np.diff(offsets))
        bits = np.searchsorted(vocab_arr, values)
        bits = bits.astype(np.uint64)
        np.bitwise_or.at(
            m, (rows, (bits >> np.uint64(6)).astype(np.int64)),
            np.uint64(1) << (bits & np.uint64(63)),
        )
    return ids, m


def _ngram_jaccard_dense(
    ds: ray.data.Dataset,
    vocab: list[int],
    *,
    text_col: str,
    id_col: str,
    n: int,
    threshold: float,
) -> ray.data.Dataset:
    """Small-vocab fast path (vocab <= DENSE_VOCAB_MAX distinct shingle
    hashes): each doc's shingle set is a W-word uint64 bitset (W =
    ceil(vocab/64)); all-pairs exact Jaccard via vectorized AND+popcount
    tiles — no candidate generation at all. Distributed: each batch of
    docs forms a tile against the broadcast global bitset matrix
    (O(n_docs * W) broadcast; the O(n^2) compute stays in worker tasks)."""
    vocab_arr = np.array(sorted(vocab), dtype=np.uint64)
    W = (len(vocab_arr) + 63) // 64

    def masks(batch: pa.Table) -> pa.Table:
        ids, m = _bitset_rows(batch, vocab_arr, text_col=text_col,
                              id_col=id_col, n=n)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "mask": pa.FixedSizeListArray.from_arrays(
                 pa.array(m.ravel(), pa.uint64()), W)}
        )

    mtbl = dataset_to_table(
        ds.map_batches(masks, batch_format="pyarrow", zero_copy_batch=True)
    )
    all_ids = mtbl.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    flat = mtbl.column("mask").combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    ).astype(np.uint64)
    all_masks = flat.reshape(len(all_ids), W)
    order = np.argsort(all_ids)
    all_ids, all_masks = all_ids[order], all_masks[order]
    all_sizes = _popcount64(all_masks).sum(axis=1)
    glob_ref = ray.put((all_ids, all_masks, all_sizes))
    mds = ray.data.from_arrow(mtbl)

    def tile(batch: pa.Table) -> pa.Table:
        gids, gmasks, gsizes = ray.get(glob_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        fl = batch.column("mask").combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        ).astype(np.uint64)
        ms = fl.reshape(len(ids), W)
        sz = _popcount64(ms).sum(axis=1)
        a_out, b_out, j_out = [], [], []
        for i in range(len(ids)):
            keep = gids > ids[i]  # each unordered pair once (a < b)
            inter = _popcount64(ms[i][None, :] & gmasks[keep]).sum(axis=1)
            union = sz[i] + gsizes[keep] - inter
            with np.errstate(invalid="ignore", divide="ignore"):
                jac = np.where(union > 0, inter / union, 0.0)
            m = jac >= threshold
            a_out.append(np.full(int(m.sum()), ids[i], dtype=np.int64))
            b_out.append(gids[keep][m])
            j_out.append(jac[m])
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(a_out), pa.int64()),
                "doc_b": pa.array(np.concatenate(b_out), pa.int64()),
                "jaccard": pa.array(np.concatenate(j_out), pa.float64()),
            }
        )

    return mds.map_batches(tile, batch_format="pyarrow", zero_copy_batch=True,
                           batch_size=256)


def _ngram_jaccard_bruteforce(
    ds: ray.data.Dataset,
    *,
    text_col: str,
    id_col: str,
    n: int,
    threshold: float,
) -> ray.data.Dataset:
    """Inverted-shingle-index all-pairs variant (the SQL oracle's twin —
    Jaccard values are hash-label-independent, so grouping runs on the
    64-bit shingle hashes)."""

    exploded = ds.map_batches(
        lambda b: _explode_shingle_hashes(b, text_col, id_col, n),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    # per-doc distinct shingle counts (one row per doc, partial-agg) -> broadcast
    sizes_tbl = dataset_to_table(
        partitioned_aggregate(
            exploded, ["doc_id"], [("shingle", "count")],
            rename={"shingle_count": "n"},
        )
    )
    if sizes_tbl.num_rows == 0 or "doc_id" not in sizes_tbl.column_names:
        return ray.data.from_arrow(_EMPTY_PAIR_TABLE)
    sizes = dict(
        zip(sizes_tbl.column("doc_id").to_pylist(), sizes_tbl.column("n").to_pylist())
    )
    sizes_ref = ray.put(sizes)

    def emit_pairs_partition(part: pa.Table) -> pa.Table:
        """All shingles of this hash partition: sort, slice runs, emit the
        per-run doc pairs, and pre-count pairs locally (C++ group_by) so
        the final exchange only sums small partials."""
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "partial": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        order = pa.compute.sort_indices(
            part, sort_keys=[("shingle", "ascending"), ("doc_id", "ascending")]
        )
        g = part.take(order)
        sh = g.column("shingle").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(sh[1:] != sh[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(sh)]))
        a_out, b_out = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            run = ids[s:e]  # ascending (partition sort key) -> rank-0 = min id
            ai, bi = _capped_pair_indices(e - s)
            a_out.append(run[ai])
            b_out.append(run[bi])
        if not a_out:
            return empty
        pairs = pa.table(
            {"a": pa.array(np.concatenate(a_out), pa.int64()),
             "b": pa.array(np.concatenate(b_out), pa.int64())}
        )
        cnt = pairs.group_by(["a", "b"], use_threads=False).aggregate([("a", "count")])
        return pa.table(
            {"a": cnt.column("a"), "b": cnt.column("b"),
             "partial": cnt.column("a_count").cast(pa.int64())}
        )

    partial_pairs = keyed_partition_map(exploded, ["shingle"], emit_pairs_partition)
    inter = partitioned_aggregate(
        partial_pairs, ["a", "b"], [("partial", "sum")], rename={"partial_sum": "c"}
    )

    def score(batch: pa.Table) -> pa.Table:
        sz = ray.get(sizes_ref)
        a = batch.column("a").to_pylist()
        b = batch.column("b").to_pylist()
        c = batch.column("c").to_pylist()
        jac = [ci / (sz[x] + sz[y] - ci) for x, y, ci in zip(a, b, c)]
        out = pa.table(
            {
                "doc_a": pa.array(a, pa.int64()),
                "doc_b": pa.array(b, pa.int64()),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out.column("jaccard"), threshold))

    return inter.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def _prefix_postings_table(
    batch: pa.Table, dfk: np.ndarray, dfv: np.ndarray, *, text_col: str,
    id_col: str, n: int, threshold: float,
) -> pa.Table:
    """Per doc: keep only the |A| - ceil(t*|A|) + 1 GLOBALLY RAREST
    shingles (rarity order = (df, hash); ceil guarded so
    threshold-boundary pairs are never lost to float truncation).
    Vectorized: one df gather + one global lexsort + rank masking.
    ``dfk``/``dfv`` are the SORTED shingle keys and their dfs — the
    pinned total order; shingles absent from dfk get df 0 (rarest),
    which preserves the prefix-filter guarantee (any common total order
    works; df order merely minimizes candidates)."""
    from ..functions.textstats import shingle_hash_column

    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    values, offsets = shingle_hash_column(col, n)
    if len(values) == 0:
        return pa.table({"shingle": pa.array([], pa.uint64()),
                         "doc_id": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    lens = np.diff(offsets)
    rows = np.repeat(np.arange(len(lens)), lens)
    dfs = np.zeros(len(values), dtype=np.int64)
    if len(dfk):
        pos = np.searchsorted(dfk, values)
        hit = (pos < len(dfk)) & (dfk[np.minimum(pos, len(dfk) - 1)] == values)
        dfs[hit] = dfv[pos[hit]]
    # order within each row by (df asc, hash asc); global lexsort
    o = np.lexsort((values, dfs, rows))
    rows_s, vals_s = rows[o], values[o]
    rank = np.arange(len(rows_s)) - np.repeat(offsets[:-1], lens)
    plen = lens - np.ceil(threshold * lens - 1e-9).astype(np.int64) + 1
    keep = rank < np.repeat(plen, lens)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {"shingle": pa.array(vals_s[keep], pa.uint64()),
         "doc_id": pa.array(ids[rows_s[keep]], pa.int64()),
         # the doc's distinct-shingle count rides along for the PPJoin
         # LENGTH filter at candidate generation
         "n": pa.array(lens[rows_s[keep]], pa.int64())}
    )


def _ngram_jaccard_prefix(
    ds: ray.data.Dataset,
    *,
    text_col: str,
    id_col: str,
    n: int,
    threshold: float,
    dense_vocab_max: int = DENSE_VOCAB_MAX,
) -> ray.data.Dataset:
    """Prefix-filtered exact Jaccard (see ngram_jaccard_pairs)."""

    exploded = ds.map_batches(
        lambda b: _explode_shingle_hashes(b, text_col, id_col, n),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    # global shingle df (small: vocab-sized) -> broadcast rarity order
    df_tbl = dataset_to_table(
        partitioned_aggregate(
            exploded, ["shingle"], [("doc_id", "count")], rename={"doc_id_count": "df"}
        )
    )
    if df_tbl.num_rows == 0 or "shingle" not in df_tbl.column_names:
        # degenerate corpus (no doc yields a shingle): empty pair set,
        # not a KeyError on the schemaless empty aggregate
        return ray.data.from_arrow(_EMPTY_PAIR_TABLE)
    df_keys = df_tbl.column("shingle").to_numpy(zero_copy_only=False).astype(np.uint64)
    df_vals = df_tbl.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
    if len(df_keys) <= dense_vocab_max:
        # small vocab: candidate generation cannot prune (most pairs
        # genuinely qualify) — dense bitset all-pairs is exact and
        # orders of magnitude faster than shipping per-pair sets
        return _ngram_jaccard_dense(
            ds, df_keys.tolist(), text_col=text_col, id_col=id_col, n=n,
            threshold=threshold,
        )
    order = np.argsort(df_keys)
    df_ref = ray.put((df_keys[order], df_vals[order]))

    def prefix_postings(batch: pa.Table) -> pa.Table:
        dfk, dfv = ray.get(df_ref)
        return _prefix_postings_table(
            batch, dfk, dfv, text_col=text_col, id_col=id_col, n=n,
            threshold=threshold,
        ).drop_columns(["n"])

    prefixes = ds.map_batches(
        prefix_postings, batch_format="pyarrow", zero_copy_batch=True
    )

    def cand_pairs_partition(part: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        order = pa.compute.sort_indices(
            part, sort_keys=[("shingle", "ascending"), ("doc_id", "ascending")]
        )
        g = part.take(order)
        sh = g.column("shingle").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(sh[1:] != sh[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(sh)]))
        a_out, b_out = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            run = ids[s:e]  # ascending (partition sort key) -> rank-0 = min id
            ai, bi = _capped_pair_indices(e - s)
            a_out.append(run[ai])
            b_out.append(run[bi])
        if not a_out:
            return empty
        t = pa.table({"a": pa.array(np.concatenate(a_out), pa.int64()),
                      "b": pa.array(np.concatenate(b_out), pa.int64())})
        return t.group_by(["a", "b"], use_threads=False).aggregate([])

    cand = keyed_partition_map(prefixes, ["shingle"], cand_pairs_partition)
    # verification: exact Jaccard via the distributed cogroup join — no
    # whole-corpus shingle map is built or broadcast anywhere; cross-
    # partition duplicate candidates are deduped inside the join's
    # stage A (same pair always co-locates on key a)
    sets = doc_shingle_sets(ds, text_col=text_col, id_col=id_col, n=n)
    return _verify_pairs_distributed(cand, sets, threshold)


def _minhash_band_table(batch: pa.Table, text_col: str, id_col: str,
                        n: int, *, with_sig: bool = False) -> pa.Table:
    """(band, doc_id) LSH band-bucket rows for one batch, fully
    vectorized: batch shingle sets (shingle_hash_column) -> batched
    signatures (one product + minimum.reduceat) -> banded keys
    (band_keys_matrix; band index salted into the key). Docs with no
    shingles emit no bands.

    with_sig=True appends a ``sig64`` column (a deterministic 64-bit
    fold of the full 128-perm signature) used by the oversized-bucket
    clone pre-collapse in minhash_neardup_pairs; OFF for the persisted
    artifact builders so their on-disk schemas are unchanged."""
    from ..functions.textstats import shingle_hash_column

    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    values, offsets = shingle_hash_column(col, n)
    lens = np.diff(offsets)
    nz = np.flatnonzero(lens > 0)
    if len(nz) == 0:
        cols = {"band": pa.array([], pa.uint64()),
                "doc_id": pa.array([], pa.int64())}
        if with_sig:
            cols["sig64"] = pa.array([], pa.uint64())
        return pa.table(cols)
    sig = mh.minhash_signature_matrix(values, offsets)[nz]
    keys = mh.band_keys_matrix(sig)  # (nz, NUM_BANDS)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)[nz]
    cols = {
        "band": pa.array(keys.ravel(), pa.uint64()),
        "doc_id": pa.array(np.repeat(ids, mh.NUM_BANDS), pa.int64()),
    }
    if with_sig:
        # position-weighted wraparound fold: identical signatures fold
        # identically; a cross-doc collision only widens one star group
        # (candidates are re-verified downstream) at ~2^-64 probability
        mult = (np.arange(1, sig.shape[1] + 1, dtype=np.uint64)
                * np.uint64(0x9E3779B97F4A7C15))
        sig64 = (sig.astype(np.uint64) * mult).sum(axis=1, dtype=np.uint64)
        cols["sig64"] = pa.array(np.repeat(sig64, mh.NUM_BANDS), pa.uint64())
    return pa.table(cols)


def minhash_neardup_pairs(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> ray.data.Dataset:
    """MinHash+LSH candidate pairs verified by exact shingle Jaccard.

    shingle -> 128-perm minhash -> 32x4 LSH bands -> band-bucket groupby ->
    candidate pairs -> exact-jaccard verification via the distributed
    cogroup join (pairs x per-doc shingle sets; nothing driver-side)."""

    def sigs(batch: pa.Table) -> pa.Table:
        return _minhash_band_table(batch, text_col, id_col, n, with_sig=True)

    sigs.__name__ = "minhash_bands"
    bands = ds.map_batches(sigs, batch_format="pyarrow", zero_copy_batch=True)

    def emit_pairs_partition(part: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        order = pa.compute.sort_indices(
            part, sort_keys=[("band", "ascending"), ("doc_id", "ascending")]
        )
        g = part.take(order)
        bands_np = g.column("band").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        sig64 = g.column("sig64").to_numpy(zero_copy_only=False).astype(np.uint64)
        starts = np.concatenate(([0], np.flatnonzero(bands_np[1:] != bands_np[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(ids)]))
        a_out, b_out = [], []
        for s, e in zip(starts, ends):
            run, ri = np.unique(ids[s:e], return_index=True)
            if len(run) < 2:
                continue
            if len(run) <= PAIR_ENUM_CAP:  # sub-cap: bit-identical to triu
                ai, bi = np.triu_indices(len(run), k=1)
                a_out.append(run[ai])
                b_out.append(run[bi])
                continue
            # oversized bucket: collapse identical signatures to one
            # representative (star edges keep clones in the closure),
            # then cap the representative enumeration
            reps, _rs, sa, sb = _collapse_run_by_sig(run, sig64[s:e][ri])
            reps = np.sort(reps)  # rank by ascending id -> a < b below
            ai, bi = _capped_pair_indices(len(reps))
            a_out.append(np.concatenate([reps[ai], sa]))
            b_out.append(np.concatenate([reps[bi], sb]))
        if not a_out:
            return empty
        t = pa.table({"a": pa.array(np.concatenate(a_out), pa.int64()),
                      "b": pa.array(np.concatenate(b_out), pa.int64())})
        return t.group_by(["a", "b"], use_threads=False).aggregate([])

    cand = keyed_partition_map(bands, ["band"], emit_pairs_partition)
    # band-collision duplicates are deduped inside the verify join's
    # stage A (same pair always co-locates on key a)
    sets = doc_shingle_sets(ds, text_col=text_col, id_col=id_col, n=n)
    return _verify_pairs_distributed(cand, sets, threshold)


def simhash_fingerprints(
    ds: ray.data.Dataset, *, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """(doc_id, simhash) 64-bit fingerprints, batch-vectorized.

    Semantics pinned by functions.minhash.simhash64 (the scalar
    reference the pytest compares against): tf-weighted sign sums of
    sha256-top-8-byte token hashes. Vectorization: tokens hash once per
    UNIQUE token (dictionary encode), the per-token ±1 bit rows come
    from one (uniq × 64) table, and per-doc accumulation is a single
    np.add.at scatter over the token->row parents."""

    def f(batch: pa.Table) -> pa.Table:
        return _fingerprint_batch(batch, text_col, id_col)

    f.__name__ = "simhash_fingerprint_batch"
    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _fingerprint_batch(batch: pa.Table, text_col: str,
                       id_col: str) -> pa.Table:
    """(doc_id, simhash) for one batch — the kernel simhash_fingerprints
    maps, shared by the delta probe which fingerprints in-process."""
    from ..functions.textstats import fp_token_hash64

    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat, parents, _dl = mh._TOK.tokenize_column(col)
    n = batch.num_rows
    acc = np.zeros((n, 64), dtype=np.int64)
    if len(flat):
        enc = flat.dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        uh = np.fromiter(
            (fp_token_hash64(t) for t in uniq), dtype=np.uint64,
            count=len(uniq),
        )
        signs = (
            2 * ((uh[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                 & np.uint64(1)).astype(np.int64) - 1
        )
        idx = enc.indices.to_numpy(zero_copy_only=False)
        np.add.at(acc, parents, signs[idx])
    fps = (
        ((acc > 0).astype(np.uint64)
         << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1)
    )
    return pa.table(
        {"doc_id": batch.column(id_col).cast(pa.int64()),
         "simhash": pa.array(fps, pa.uint64())}
    )


def simhash_neardup_pairs(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> ray.data.Dataset:
    """Pairs with Hamming(simhash) <= max_hamming via banded buckets.

    Band count is derived from max_hamming (pigeonhole): with B bands, a
    pair differing in <= B-1 bits always shares an unchanged band, so
    B = smallest divisor of 64 that is >= max_hamming+1 gives GUARANTEED
    recall (not probabilistic) at the requested radius."""
    n_bands = next(b for b in (2, 4, 8, 16, 32, 64) if b >= max_hamming + 1)
    bands = _simhash_band_rows(ds, text_col=text_col, id_col=id_col,
                               n_bands=n_bands)

    def emit_checked_partition(part: pa.Table) -> pa.Table:
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "hamming": pa.array([], pa.int32())})
        if part.num_rows == 0:
            return empty
        order = pa.compute.sort_indices(
            part, sort_keys=[("band", "ascending"), ("doc_id", "ascending")]
        )
        g = part.take(order)
        bands_np = g.column("band").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        hs = g.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        starts = np.concatenate(([0], np.flatnonzero(bands_np[1:] != bands_np[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(ids)]))
        a_out, b_out, d_out = [], [], []
        for s, e in zip(starts, ends):
            # dedupe (id, hash) rows in (id, hash) order, then check all
            # run pairs with a vectorized XOR+popcount tile (the Python
            # per-pair loop degraded quadratically on duplicate-heavy
            # bands — the very input a dedup pass targets)
            o = np.lexsort((hs[s:e], ids[s:e]))
            rid, rh = ids[s:e][o], hs[s:e][o]
            first = np.concatenate(
                ([True], (rid[1:] != rid[:-1]) | (rh[1:] != rh[:-1])))
            rid, rh = rid[first], rh[first]
            m = len(rid)
            if m < 2:
                continue
            if m <= PAIR_ENUM_CAP:  # sub-cap: bit-identical to triu
                ai, bi = np.triu_indices(m, k=1)
                d = _popcount64(rh[ai] ^ rh[bi])
                keep = d <= max_hamming
                if keep.any():
                    a_out.append(rid[ai[keep]])
                    b_out.append(rid[bi[keep]])
                    d_out.append(d[keep])
                continue
            # oversized bucket: collapse identical fingerprints (their
            # star edges are hamming-0 by construction), then cap the
            # distinct-fingerprint enumeration with an exact per-pair
            # hamming check — emitted values stay exact
            reps, rsig, sa, sb = _collapse_run_by_sig(rid, rh)
            o2 = np.argsort(reps)
            reps, rsig = reps[o2], rsig[o2]
            ai, bi = _capped_pair_indices(len(reps))
            d = _popcount64(rsig[ai] ^ rsig[bi])
            keep = d <= max_hamming
            a_out.append(np.concatenate([reps[ai[keep]], sa]))
            b_out.append(np.concatenate([reps[bi[keep]], sb]))
            d_out.append(np.concatenate(
                [d[keep], np.zeros(len(sa), dtype=d.dtype)]))
        if not a_out:
            return empty
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(a_out), pa.int64()),
                "doc_b": pa.array(np.concatenate(b_out), pa.int64()),
                "hamming": pa.array(
                    np.concatenate(d_out).astype(np.int32), pa.int32()),
            }
        )

    pairs = keyed_partition_map(bands, ["band"], emit_checked_partition)
    # a pair can match in multiple bands -> dedup (min over identical values)
    return partitioned_aggregate(
        pairs, ["doc_a", "doc_b"], [("hamming", "min")],
        rename={"hamming_min": "min(hamming)"},
    )

# ---- incremental dedup: delta shard vs a persisted dedup-index artifact ----
#
# The production 100 TB shape: the corpus is deduped ONCE and its
# dedup-side state persisted; every new crawl shard then probes that
# artifact without re-reading corpus text. Exactness is preserved — the
# PPJoin prefix guarantee holds under any COMMON total order, so delta
# docs rank their shingles by the artifact's pinned (corpus df, hash)
# order (unseen shingles df=0 = rarest) and candidate generation stays
# complete for J >= threshold cross pairs.

def _resume_or_clear_artifact(out_dir: str, pinned: dict) -> "dict | None":
    """Shared idempotency gate for the three dedup-artifact builders
    (review finding: they wrote _DONE but never CHECKED it, so a resumed
    build appended a second copy of every row into the partitioned
    artifact dirs). A complete artifact whose pinned spec matches the
    request early-returns its recorded meta; a spec MISMATCH raises (a
    silent wrong-spec reuse would change near-dup semantics); anything
    else — a crashed partial — is cleared for a clean rebuild."""
    import json as _json
    import shutil as _shutil

    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        with open(os.path.join(out_dir, "meta.json")) as f:
            meta = _json.load(f)
        mismatch = {k: (meta.get(k), v) for k, v in pinned.items()
                    if meta.get(k) != v}
        if mismatch:
            raise ValueError(
                f"artifact at {out_dir} was built with a different "
                f"pinned spec: {mismatch}; build to a fresh directory")
        return meta
    if os.path.exists(out_dir):
        _shutil.rmtree(out_dir)  # crashed partial: rebuild clean
    return None


def build_dedup_index(
    ds: ray.data.Dataset, out_dir: str, *, text_col: str = "text",
    id_col: str = "doc_id", n: int = 1, threshold: float = 0.5,
) -> dict:
    """Persist the corpus side of incremental near-dup detection:
      df.parquet     (shingle, df)      — the pinned rarity order
                                          (vocab-sized, one sorted file)
      prefixes/      (shingle, doc_id)   — PPJoin prefix postings at the
                                           pinned threshold (partitioned)
      sets/          (doc_id, hashes)    — exact-verify shingle sets
                                           (partitioned)
      meta.json + _DONE — pinned (n, threshold) and build counts
    Probes must use the SAME (n, threshold) (checked by
    ngram_jaccard_delta)."""
    import json

    import pyarrow.parquet as pq

    done = _resume_or_clear_artifact(
        out_dir, {"n": n, "threshold": threshold})
    if done is not None:
        return done
    os.makedirs(out_dir, exist_ok=True)
    exploded = ds.map_batches(
        lambda b: _explode_shingle_hashes(b, text_col, id_col, n),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    df_tbl = dataset_to_table(
        partitioned_aggregate(
            exploded, ["shingle"], [("doc_id", "count")],
            rename={"doc_id_count": "df"},
        )
    ).sort_by([("shingle", "ascending")])
    pq.write_table(df_tbl, os.path.join(out_dir, "df.parquet"))

    dfk = df_tbl.column("shingle").to_numpy(zero_copy_only=False).astype(np.uint64)
    dfv = df_tbl.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
    df_ref = ray.put((dfk, dfv))

    def prefixes(batch: pa.Table) -> pa.Table:
        k, v = ray.get(df_ref)
        return _prefix_postings_table(
            batch, k, v, text_col=text_col, id_col=id_col, n=n,
            threshold=threshold,
        )

    # prefixes and sets are corpus-sized: stream them out as PARTITIONED
    # parquet directories (many files), never one driver-side table
    pref_ds = ds.map_batches(
        prefixes, batch_format="pyarrow", zero_copy_batch=True
    )
    pref_ds.write_parquet(os.path.join(out_dir, "prefixes"))
    sets_ds = doc_shingle_sets(ds, text_col=text_col, id_col=id_col, n=n)
    sets_ds.write_parquet(os.path.join(out_dir, "sets"))
    n_docs = ray.data.read_parquet(os.path.join(out_dir, "sets")).count()
    n_pref = ray.data.read_parquet(os.path.join(out_dir, "prefixes")).count()

    meta = {"n": n, "threshold": threshold, "n_docs": n_docs,
            "vocab": df_tbl.num_rows, "prefix_rows": n_pref}
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(out_dir, "_DONE"), "w") as f:
        f.write("ok")
    return meta


# corpus-bitset broadcast budget for the dense delta path: n_docs x W
# uint64 words must ship once per worker (256 MB ~= 0.5M docs at the
# 4096-bit vocab ceiling); beyond it the prefix+verify join path wins
_DENSE_BCAST_MAX_BYTES = 1 << 28


def _masks_from_sets(batch: pa.Table, vocab_arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(ids, rows x W uint64 bitsets) from a (doc_id, hashes) sets batch
    — the artifact-side twin of _bitset_rows (which starts from text)."""
    W = (len(vocab_arr) + 63) // 64
    values, offsets = _list_column_slices(batch.column("hashes"))
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    m = np.zeros((batch.num_rows, W), dtype=np.uint64)
    if len(values):
        rows = np.repeat(np.arange(batch.num_rows), np.diff(offsets))
        bits = np.searchsorted(vocab_arr, values).astype(np.uint64)
        np.bitwise_or.at(
            m, (rows, (bits >> np.uint64(6)).astype(np.int64)),
            np.uint64(1) << (bits & np.uint64(63)),
        )
    return ids, m


def _ngram_jaccard_delta_dense(
    index_dir: str,
    delta: ray.data.Dataset,
    *,
    corpus_vocab: np.ndarray,
    n: int,
    threshold: float,
    text_col: str,
    id_col: str,
) -> ray.data.Dataset | None:
    """Small-vocab fast path for the delta probe: when the UNION
    vocabulary (corpus df keys + the delta's distinct shingles) fits
    DENSE_VOCAB_MAX, candidate generation cannot prune (most cross pairs
    genuinely qualify) and per-pair set shipping dominates — so compute
    ALL cross pairs directly: corpus bitsets built from the artifact's
    sets/ parquet broadcast once (gated by _DENSE_BCAST_MAX_BYTES), each
    delta batch AND+popcount tiles against them. Exact — identical
    output to the prefix+verify path (PPJoin completeness makes that
    path a no-loss filter; this one skips the filter entirely). Returns
    None when the vocab or broadcast budget rules the path out."""
    ex = delta.map_batches(
        lambda b: _explode_shingle_hashes(b, text_col, id_col, n),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def batch_uniques(batch: pa.Table) -> pa.Table:
        u = np.unique(batch.column("shingle").to_numpy(zero_copy_only=False))
        return pa.table({"shingle": pa.array(u, pa.uint64())})

    d_uniq_tbl = dataset_to_table(ex.map_batches(
        batch_uniques, batch_format="pyarrow", zero_copy_batch=True))
    d_uniq = np.unique(
        d_uniq_tbl.column("shingle").to_numpy(zero_copy_only=False).astype(np.uint64))
    vocab_arr = np.union1d(corpus_vocab, d_uniq)
    W = (len(vocab_arr) + 63) // 64
    if len(vocab_arr) > DENSE_VOCAB_MAX:
        return None
    # budget-check from the artifact's recorded n_docs BEFORE scanning
    # sets/ and materializing every mask on the driver — the spike the
    # budget exists to prevent
    import json as _json

    with open(os.path.join(index_dir, "meta.json")) as f:
        n_corpus = int(_json.load(f).get("n_docs", 0))
    if n_corpus * W * 8 > _DENSE_BCAST_MAX_BYTES:
        return None

    sets_ds = ray.data.read_parquet(os.path.join(index_dir, "sets"))

    def corpus_masks(batch: pa.Table) -> pa.Table:
        ids, m = _masks_from_sets(batch, vocab_arr)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "mask": pa.FixedSizeListArray.from_arrays(
                 pa.array(m.ravel(), pa.uint64()), W)})

    mtbl = dataset_to_table(sets_ds.map_batches(
        corpus_masks, batch_format="pyarrow", zero_copy_batch=True))
    if mtbl.num_rows * W * 8 > _DENSE_BCAST_MAX_BYTES:
        return None
    gids = mtbl.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    gmasks = mtbl.column("mask").combine_chunks().flatten().to_numpy(
        zero_copy_only=False).astype(np.uint64).reshape(len(gids), W)
    gsizes = _popcount64(gmasks).sum(axis=1)
    glob_ref = ray.put((gids, gmasks, gsizes))

    def tile(batch: pa.Table) -> pa.Table:
        cids, cmasks, csizes = ray.get(glob_ref)
        ids, ms = _bitset_rows(batch, vocab_arr, text_col=text_col,
                               id_col=id_col, n=n)
        sz = _popcount64(ms).sum(axis=1)
        a_out, b_out, j_out = [], [], []
        for i in range(len(ids)):
            inter = _popcount64(ms[i][None, :] & cmasks).sum(axis=1)
            union = sz[i] + csizes - inter
            with np.errstate(invalid="ignore", divide="ignore"):
                jac = np.where(union > 0, inter / union, 0.0)
            m = jac >= threshold
            a_out.append(cids[m])
            b_out.append(np.full(int(m.sum()), ids[i], dtype=np.int64))
            j_out.append(jac[m])
        if not a_out:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        return pa.table(
            {"doc_a": pa.array(np.concatenate(a_out), pa.int64()),
             "doc_b": pa.array(np.concatenate(b_out), pa.int64()),
             "jaccard": pa.array(np.concatenate(j_out), pa.float64())})

    tile.__name__ = "delta_dense_tile"
    return delta.map_batches(tile, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=256)


def ngram_jaccard_delta(
    index_dir: str,
    delta: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Exact cross-pair n-gram Jaccard >= threshold between a NEW delta
    shard and the corpus behind a dedup-index artifact — corpus text is
    never re-read; its df / prefix / set state streams from the
    artifact's parquet. Returns (doc_a = corpus doc, doc_b = delta doc,
    jaccard). Delta and corpus doc ids must be disjoint.

    Same exchange budget as one ngram_jaccard round: a shingle-keyed
    candidate exchange over (corpus prefixes UNION delta prefixes) that
    emits CROSS-side pairs only, then the distributed two-stage verify
    join against (corpus sets UNION delta sets)."""
    import json

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    n, threshold = int(meta["n"]), float(meta["threshold"])

    dfk_tbl = dataset_to_table(
        ray.data.read_parquet(os.path.join(index_dir, "df.parquet"))
    )
    dfk = dfk_tbl.column("shingle").to_numpy(zero_copy_only=False).astype(np.uint64)
    dfv = dfk_tbl.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(dfk)  # searchsorted needs sorted keys whatever the
    dfk, dfv = dfk[o], dfv[o]  # block order of the artifact read was

    if len(dfk) <= DENSE_VOCAB_MAX and threshold > 0:
        # small corpus vocab: try the dense cross-tile path (returns
        # None when the union vocab or the corpus-mask broadcast budget
        # rules it out, in which case fall through to prefix+verify)
        delta = delta.materialize()  # consumed twice below (vocab probe + tiles)
        out = _ngram_jaccard_delta_dense(
            index_dir, delta, corpus_vocab=dfk, n=n, threshold=threshold,
            text_col=text_col, id_col=id_col,
        )
        if out is not None:
            return out

    df_ref = ray.put((dfk, dfv))

    def delta_prefixes(batch: pa.Table) -> pa.Table:
        k, v = ray.get(df_ref)
        t = _prefix_postings_table(
            batch, k, v, text_col=text_col, id_col=id_col, n=n,
            threshold=threshold,
        )
        return t.append_column(
            "side", pa.array(np.ones(t.num_rows, np.int8), pa.int8())
        )

    def corpus_side(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "side", pa.array(np.zeros(batch.num_rows, np.int8), pa.int8())
        )

    pref_union = ray.data.read_parquet(
        os.path.join(index_dir, "prefixes")
    ).map_batches(corpus_side, batch_format="pyarrow", zero_copy_batch=True).union(
        delta.map_batches(delta_prefixes, batch_format="pyarrow",
                          zero_copy_batch=True)
    )

    def cross_pairs_partition(part: pa.Table) -> pa.Table:
        """Per shingle run: (corpus ids) x (delta ids) cross pairs,
        pruned by the PPJoin LENGTH filter — J >= t forces
        t*|B| <= |A| <= |B|/t, so size-incompatible pairs never reach
        verification (guarded float compare like the prefix length)."""
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        order = pa.compute.sort_indices(
            part, sort_keys=[("shingle", "ascending"), ("side", "ascending"),
                             ("doc_id", "ascending")]
        )
        g = part.take(order)
        sh = g.column("shingle").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        szs = g.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        side = g.column("side").to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(sh[1:] != sh[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(sh)]))
        a_out, b_out = [], []
        for s, e in zip(starts, ends):
            sd = side[s:e]
            n0 = int(np.searchsorted(sd, 1))  # corpus rows come first
            if n0 == 0 or n0 == e - s:
                continue
            ca, db = ids[s:s + n0], ids[s + n0:e]
            na, nb = szs[s:s + n0], szs[s + n0:e]
            pa_ = np.repeat(ca, len(db))
            pb_ = np.tile(db, len(ca))
            ra = np.repeat(na, len(db)).astype(np.float64)
            rb = np.tile(nb, len(ca)).astype(np.float64)
            ok = (np.minimum(ra, rb) >= threshold * np.maximum(ra, rb) - 1e-9)
            if ok.any():
                a_out.append(pa_[ok])
                b_out.append(pb_[ok])
        if not a_out:
            return empty
        t = pa.table({"a": pa.array(np.concatenate(a_out), pa.int64()),
                      "b": pa.array(np.concatenate(b_out), pa.int64())})
        return t.group_by(["a", "b"], use_threads=False).aggregate([])

    cand = keyed_partition_map(pref_union, ["shingle"], cross_pairs_partition)
    # every candidate is (corpus a, delta b): the a-stage consumes only
    # the artifact's sets, the b-stage only the delta's — no union ships
    corpus_sets = ray.data.read_parquet(os.path.join(index_dir, "sets"))
    delta_sets = doc_shingle_sets(delta, text_col=text_col, id_col=id_col, n=n)
    return _verify_pairs_distributed(
        cand, corpus_sets, threshold, sets_b=delta_sets
    )


# ---- incremental minhash: delta shard vs a persisted LSH band artifact ----
#
# The minhash analogue of build_dedup_index / ngram_jaccard_delta: the
# corpus is signed ONCE and its band buckets + exact-verify shingle sets
# persisted; every new crawl shard signs only ITS OWN docs and probes the
# band buckets — at 100 TB the corpus is never re-signed or re-read per
# delta batch. Candidate completeness is the same LSH guarantee as the
# full run: a cross pair is a candidate iff the two docs share >= 1 band
# key, and band keys are a pure function of the pinned perm/band spec.

def build_minhash_index(
    ds: ray.data.Dataset, out_dir: str, *, text_col: str = "text",
    id_col: str = "doc_id", n: int = 3, threshold: float = 0.5,
) -> dict:
    """Persist the corpus side of incremental MinHash near-dup:
      bands/  (band, doc_id)   — LSH band buckets (partitioned; band
                                 keys salt in the band index)
      sets/   (doc_id, hashes) — exact-verify shingle sets (partitioned)
      meta.json + _DONE        — pinned (n, threshold, perm/band spec)
    Probes must use the SAME spec (checked by minhash_neardup_delta)."""
    import json

    done = _resume_or_clear_artifact(
        out_dir, {"n": n, "threshold": threshold})
    if done is not None:
        return done
    os.makedirs(out_dir, exist_ok=True)

    def sigs(batch: pa.Table) -> pa.Table:
        return _minhash_band_table(batch, text_col, id_col, n)

    sigs.__name__ = "minhash_index_bands"
    # bands and sets are corpus-sized: stream them out as PARTITIONED
    # parquet directories (many files), never one driver-side table
    ds.map_batches(
        sigs, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(os.path.join(out_dir, "bands"))
    doc_shingle_sets(
        ds, text_col=text_col, id_col=id_col, n=n
    ).write_parquet(os.path.join(out_dir, "sets"))
    n_docs = ray.data.read_parquet(os.path.join(out_dir, "sets")).count()
    n_band = ray.data.read_parquet(os.path.join(out_dir, "bands")).count()

    def count_vals(batch: pa.Table) -> pa.Table:
        _, off = _list_column_slices(batch.column("hashes"))
        return pa.table({"v": pa.array(
            [int(off[-1]) if len(off) else 0], pa.int64())})

    # total shingle-hash count, recorded so delta probes can budget the
    # broadcast fast path from meta WITHOUT reading the sets artifact
    set_values = sum(
        r["v"] for r in ray.data.read_parquet(os.path.join(out_dir, "sets"))
        .map_batches(count_vals, batch_format="pyarrow",
                     zero_copy_batch=True).take_all())

    meta = {"n": n, "threshold": threshold, "n_docs": n_docs,
            "band_rows": n_band, "set_values": int(set_values),
            "num_perms": mh.NUM_PERMS, "num_bands": mh.NUM_BANDS}
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(out_dir, "_DONE"), "w") as f:
        f.write("ok")
    return meta


# broadcast budgets for the small-corpus minhash delta fast path: the
# artifact's band rows (16 B each) and shingle-set values (8 B each)
# ship once per worker; past either bound the exchange path runs
_MINHASH_BCAST_MAX_BANDS = 4_000_000    # ~64 MB of (band, doc_id)
_MINHASH_BCAST_MAX_VALUES = 30_000_000  # ~240 MB of shingle hashes


def _minhash_delta_broadcast(
    index_dir: str,
    delta: ray.data.Dataset,
    *,
    n: int,
    threshold: float,
    text_col: str,
    id_col: str,
    meta: dict,
) -> ray.data.Dataset | None:
    """Small-corpus fast path: the artifact's band buckets and shingle
    sets broadcast ONCE (budget-gated by the meta counts), and each
    delta batch does candidate generation (searchsorted into the sorted
    band keys) AND exact-Jaccard verification map-side — zero keyed
    exchanges (the exchange path's fixed multi-stage cost dominates
    small runs ~8x). Identical output to the exchange path: same band
    candidates, same exact verify, same threshold. Returns None when a
    budget rules it out."""
    # BOTH budgets gate from meta before any read — an artifact missing
    # set_values (pre-round-3 build) takes the exchange path
    if (meta.get("band_rows", 1 << 62) > _MINHASH_BCAST_MAX_BANDS
            or meta.get("set_values", 1 << 62) > _MINHASH_BCAST_MAX_VALUES):
        return None
    bands_t = dataset_to_table(
        ray.data.read_parquet(os.path.join(index_dir, "bands")))
    sets_t = dataset_to_table(
        ray.data.read_parquet(os.path.join(index_dir, "sets")))
    bk = bands_t.column("band").to_numpy(zero_copy_only=False).astype(np.uint64)
    bd = bands_t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(bk, kind="stable")
    bk, bd = bk[o], bd[o]
    lookup = _set_lookup(sets_t)
    ref = ray.put((bk, bd, lookup))

    def probe(batch: pa.Table) -> pa.Table:
        from ..functions.textstats import shingle_hash_column

        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "jaccard": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        k_, d_, lk = ray.get(ref)
        bt = _minhash_band_table(batch, text_col, id_col, n)
        if bt.num_rows == 0 or len(k_) == 0:
            return empty
        qk = bt.column("band").to_numpy(zero_copy_only=False).astype(np.uint64)
        qd = bt.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.searchsorted(k_, qk, side="left")
        hi = np.searchsorted(k_, qk, side="right")
        cnt = hi - lo
        nz = np.flatnonzero(cnt)
        if not len(nz):
            return empty
        pa_ = np.concatenate([d_[lo[i]:hi[i]] for i in nz])
        pb_ = np.repeat(qd[nz], cnt[nz])
        pairs = np.unique(np.stack([pa_, pb_], axis=1), axis=0)
        # exact verify map-side, grouped like _verify_pairs_distributed's
        # verify_b (no per-pair Python): pairs sort by delta doc b, and
        # each b-run scores ALL its corpus sets with one searchsorted +
        # segment sum against hb. A delta doc lives in exactly one
        # batch, so batch-local dedup is global dedup for cross pairs.
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        values, offsets = shingle_hash_column(col, n)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        bo = np.argsort(ids, kind="stable")
        ids_s = ids[bo]
        av, ao = _gather_lists(lk, pairs[:, 0])
        na = np.diff(ao)
        n_pairs = len(pairs)
        inter = np.zeros(n_pairs, dtype=np.int64)
        nb = np.zeros(n_pairs, dtype=np.int64)
        b_arr = pairs[:, 1]
        bo2 = np.argsort(b_arr, kind="stable")
        b_s = b_arr[bo2]
        run_starts = np.concatenate(
            ([0], np.flatnonzero(b_s[1:] != b_s[:-1]) + 1))
        run_ends = np.concatenate((run_starts[1:], [n_pairs]))
        for s_, e_ in zip(run_starts, run_ends):
            sel = bo2[s_:e_]
            bi = int(bo[np.searchsorted(ids_s, b_s[s_])])
            hb = values[offsets[bi]:offsets[bi + 1]]
            nb[sel] = len(hb)
            lens = na[sel]
            tot = int(lens.sum())
            if tot == 0 or len(hb) == 0:
                continue
            out_off = np.concatenate(([0], np.cumsum(lens)))
            rel = np.arange(tot, dtype=np.int64) - np.repeat(
                out_off[:-1], lens)
            vals = av[np.repeat(ao[sel], lens) + rel]
            p_ = np.searchsorted(hb, vals)
            found = (p_ < len(hb)) & (hb[np.minimum(p_, len(hb) - 1)] == vals)
            inter[sel] = np.bincount(
                np.repeat(np.arange(len(sel)), lens), weights=found,
                minlength=len(sel),
            ).astype(np.int64)
        union = na + nb - inter
        with np.errstate(invalid="ignore"):
            jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        keep = jac >= threshold
        return pa.table({"doc_a": pa.array(pairs[keep, 0], pa.int64()),
                         "doc_b": pa.array(pairs[keep, 1], pa.int64()),
                         "jaccard": pa.array(jac[keep], pa.float64())})

    probe.__name__ = "minhash_delta_broadcast_probe"
    return delta.map_batches(probe, batch_format="pyarrow",
                             zero_copy_batch=True)


def minhash_neardup_delta(
    index_dir: str,
    delta: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Cross-pair MinHash near-dups between a NEW delta shard and the
    corpus behind a build_minhash_index artifact — corpus text is never
    re-read and never re-signed; its band buckets and shingle sets
    stream from the artifact's parquet. Returns (doc_a = corpus doc,
    doc_b = delta doc, jaccard) for candidates sharing >= 1 LSH band,
    verified by exact shingle Jaccard >= the pinned threshold. Delta
    and corpus doc ids must be disjoint.

    Exchange budget: one band-keyed candidate exchange over (corpus
    bands UNION delta bands) emitting CROSS-side pairs only, then the
    distributed two-stage verify join (corpus sets x delta sets)."""
    import json

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    n, threshold = int(meta["n"]), float(meta["threshold"])
    if (meta.get("num_perms") != mh.NUM_PERMS
            or meta.get("num_bands") != mh.NUM_BANDS):
        raise ValueError(
            "minhash index was built under a different perm/band spec "
            f"({meta.get('num_perms')}x{meta.get('num_bands')} vs "
            f"{mh.NUM_PERMS}x{mh.NUM_BANDS}); rebuild the artifact")

    out = _minhash_delta_broadcast(
        index_dir, delta, n=n, threshold=threshold,
        text_col=text_col, id_col=id_col, meta=meta)
    if out is not None:
        return out

    def corpus_side(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "side", pa.array(np.zeros(batch.num_rows, np.int8), pa.int8())
        )

    def delta_bands(batch: pa.Table) -> pa.Table:
        t = _minhash_band_table(batch, text_col, id_col, n)
        return t.append_column(
            "side", pa.array(np.ones(t.num_rows, np.int8), pa.int8())
        )

    delta_bands.__name__ = "minhash_delta_bands"
    band_union = ray.data.read_parquet(
        os.path.join(index_dir, "bands")
    ).map_batches(corpus_side, batch_format="pyarrow",
                  zero_copy_batch=True).union(
        delta.map_batches(delta_bands, batch_format="pyarrow",
                          zero_copy_batch=True)
    )

    def cross_pairs_partition(part: pa.Table) -> pa.Table:
        """Per band-key run: (corpus ids) x (delta ids) cross pairs
        only — same-side pairs were resolved when the corpus was
        deduped, so emitting them would re-verify known state."""
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        order = pa.compute.sort_indices(
            part, sort_keys=[("band", "ascending"), ("side", "ascending"),
                             ("doc_id", "ascending")]
        )
        g = part.take(order)
        bd = g.column("band").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        side = g.column("side").to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(bd[1:] != bd[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(bd)]))
        a_out, b_out = [], []
        for s, e in zip(starts, ends):
            sd = side[s:e]
            n0 = int(np.searchsorted(sd, 1))  # corpus rows come first
            if n0 == 0 or n0 == e - s:
                continue
            ca = np.unique(ids[s:s + n0])
            db = np.unique(ids[s + n0:e])
            a_out.append(np.repeat(ca, len(db)))
            b_out.append(np.tile(db, len(ca)))
        if not a_out:
            return empty
        t = pa.table({"a": pa.array(np.concatenate(a_out), pa.int64()),
                      "b": pa.array(np.concatenate(b_out), pa.int64())})
        return t.group_by(["a", "b"], use_threads=False).aggregate([])

    cand = keyed_partition_map(band_union, ["band"], cross_pairs_partition)
    # every candidate is (corpus a, delta b): the a-stage consumes only
    # the artifact's sets, the b-stage only the delta's — no union ships
    corpus_sets = ray.data.read_parquet(os.path.join(index_dir, "sets"))
    delta_sets = doc_shingle_sets(delta, text_col=text_col, id_col=id_col, n=n)
    return _verify_pairs_distributed(
        cand, corpus_sets, threshold, sets_b=delta_sets
    )


# ---- incremental simhash: delta shard vs a persisted band artifact ----
#
# The third near-dup method's delta flow (ngram and minhash above):
# fingerprints + pigeonhole band buckets persisted once; a new shard
# fingerprints only ITS docs and probes the buckets. Verification is an
# XOR+popcount on the 64-bit fingerprints carried IN the band rows, so
# no second join is needed anywhere — and recall at the radius stays
# GUARANTEED (a pair within max_hamming always shares an unchanged
# band).

_SIMHASH_BCAST_MAX_BANDS = 8_000_000  # ~128 MB of (band, doc_id, fp)


def build_simhash_index(
    ds: ray.data.Dataset, out_dir: str, *, text_col: str = "text",
    id_col: str = "doc_id", max_hamming: int = 3,
) -> dict:
    """Persist the corpus side of incremental SimHash near-dup:
      bands/  (band, doc_id, simhash) — pigeonhole band buckets with
                                        the fingerprint carried in-row
      meta.json + _DONE             — pinned (max_hamming, n_bands)
    Probes must use the SAME radius (checked by simhash_neardup_delta)."""
    import json

    done = _resume_or_clear_artifact(
        out_dir, {"max_hamming": int(max_hamming)})
    if done is not None:
        return done
    os.makedirs(out_dir, exist_ok=True)
    n_bands = next(b for b in (2, 4, 8, 16, 32, 64) if b >= max_hamming + 1)
    _simhash_band_rows(
        ds, text_col=text_col, id_col=id_col, n_bands=n_bands
    ).write_parquet(os.path.join(out_dir, "bands"))
    n_band = ray.data.read_parquet(os.path.join(out_dir, "bands")).count()
    meta = {"max_hamming": int(max_hamming), "n_bands": int(n_bands),
            "band_rows": int(n_band), "n_docs": int(n_band // n_bands)}
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(out_dir, "_DONE"), "w") as f:
        f.write("ok")
    return meta


def _simhash_band_rows(
    ds: ray.data.Dataset, *, text_col: str, id_col: str, n_bands: int
) -> ray.data.Dataset:
    """(band, doc_id, simhash) rows — the banded-bucket projection the
    full-pairs path uses, shared by the artifact build and delta."""
    fps = simhash_fingerprints(ds, text_col=text_col, id_col=id_col)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        hs = batch.column("simhash").to_numpy(zero_copy_only=False)
        width = np.uint64(64 // n_bands)
        bands_ix = np.arange(n_bands, dtype=np.uint64)
        mask = np.uint64((1 << int(width)) - 1)
        keys = (bands_ix << width)[None, :] | (
            (hs[:, None] >> (bands_ix * width)[None, :]) & mask
        )
        return pa.table(
            {"band": pa.array(keys.reshape(-1), pa.uint64()),
             "doc_id": pa.array(np.repeat(ids, n_bands), pa.int64()),
             "simhash": pa.array(np.repeat(hs, n_bands), pa.uint64())}
        )

    explode.__name__ = "simhash_band_rows"
    return fps.map_batches(explode, batch_format="pyarrow",
                           zero_copy_batch=True)


def simhash_neardup_delta(
    index_dir: str,
    delta: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Cross pairs with Hamming(simhash) <= the artifact's pinned radius
    between a NEW delta shard and the corpus behind build_simhash_index
    — the corpus is never re-read or re-fingerprinted. Returns (doc_a =
    corpus doc, doc_b = delta doc, min(hamming)); recall at the radius
    is pigeonhole-guaranteed, so the output is exact.

    Small-corpus fast path (band_rows under the broadcast budget): the
    artifact's band rows ship once sorted by key and each delta batch
    matches + verifies map-side — zero exchanges. Beyond it: one
    band-keyed cross-side exchange verifying inline (fingerprints ride
    in the band rows), then a (doc_a, doc_b) min-hamming aggregate."""
    import json

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    max_hamming = int(meta["max_hamming"])
    n_bands = int(meta["n_bands"])

    if meta.get("band_rows", 1 << 62) <= _SIMHASH_BCAST_MAX_BANDS:
        bands_t = dataset_to_table(
            ray.data.read_parquet(os.path.join(index_dir, "bands")))
        bk = bands_t.column("band").to_numpy(
            zero_copy_only=False).astype(np.uint64)
        bd = bands_t.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        bh = bands_t.column("simhash").to_numpy(
            zero_copy_only=False).astype(np.uint64)
        o = np.argsort(bk, kind="stable")
        bk, bd, bh = bk[o], bd[o], bh[o]
        ref = ray.put((bk, bd, bh))

        def probe(batch: pa.Table) -> pa.Table:
            empty = pa.table({"doc_a": pa.array([], pa.int64()),
                              "doc_b": pa.array([], pa.int64()),
                              "min(hamming)": pa.array([], pa.int32())})
            if batch.num_rows == 0:
                return empty
            k_, d_, h_ = ray.get(ref)
            # fingerprint + band the delta batch in-process (the same
            # kernel simhash_fingerprints maps)
            fps_tbl = _fingerprint_batch(batch, text_col, id_col)
            ids = fps_tbl.column("doc_id").to_numpy(zero_copy_only=False)
            hs = fps_tbl.column("simhash").to_numpy(
                zero_copy_only=False).astype(np.uint64)
            width = np.uint64(64 // n_bands)
            bands_ix = np.arange(n_bands, dtype=np.uint64)
            mask = np.uint64((1 << int(width)) - 1)
            keys = (bands_ix << width)[None, :] | (
                (hs[:, None] >> (bands_ix * width)[None, :]) & mask)
            qk = keys.reshape(-1)
            qd = np.repeat(ids, n_bands)
            qh = np.repeat(hs, n_bands)
            lo = np.searchsorted(k_, qk, side="left")
            hi = np.searchsorted(k_, qk, side="right")
            cnt = hi - lo
            nz = np.flatnonzero(cnt)
            if not len(nz) or not len(k_):
                return empty
            pa_ = np.concatenate([d_[lo[i]:hi[i]] for i in nz])
            ph_ = np.concatenate([h_[lo[i]:hi[i]] for i in nz])
            pb_ = np.repeat(qd[nz], cnt[nz])
            qh_ = np.repeat(qh[nz], cnt[nz])
            d = _popcount64(ph_ ^ qh_)
            keep = d <= max_hamming
            if not keep.any():
                return empty
            t = pa.table({"a": pa.array(pa_[keep], pa.int64()),
                          "b": pa.array(pb_[keep], pa.int64()),
                          "h": pa.array(d[keep].astype(np.int32),
                                        pa.int32())})
            g = t.group_by(["a", "b"], use_threads=False).aggregate(
                [("h", "min")])
            return pa.table({
                "doc_a": g.column("a"),
                "doc_b": g.column("b"),
                "min(hamming)": g.column("h_min"),
            })

        probe.__name__ = "simhash_delta_broadcast_probe"
        return delta.map_batches(probe, batch_format="pyarrow",
                                 zero_copy_batch=True)

    # exchange path: union of corpus band rows (side 0) and delta band
    # rows (side 1), cross-side Hamming check inline per band run
    def corpus_side(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "side", pa.array(np.zeros(batch.num_rows, np.int8), pa.int8()))

    def delta_side(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "side", pa.array(np.ones(batch.num_rows, np.int8), pa.int8()))

    union = ray.data.read_parquet(
        os.path.join(index_dir, "bands")
    ).map_batches(corpus_side, batch_format="pyarrow",
                  zero_copy_batch=True).union(
        _simhash_band_rows(delta, text_col=text_col, id_col=id_col,
                           n_bands=n_bands)
        .map_batches(delta_side, batch_format="pyarrow",
                     zero_copy_batch=True)
    )

    def cross_checked(part: pa.Table) -> pa.Table:
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "h": pa.array([], pa.int32())})
        if part.num_rows == 0:
            return empty
        order = pa.compute.sort_indices(
            part, sort_keys=[("band", "ascending"), ("side", "ascending"),
                             ("doc_id", "ascending")])
        g = part.take(order)
        bnp = g.column("band").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        hs = g.column("simhash").to_numpy(
            zero_copy_only=False).astype(np.uint64)
        side = g.column("side").to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(bnp[1:] != bnp[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(ids)]))
        a_out, b_out, h_out = [], [], []
        for s, e in zip(starts, ends):
            sd = side[s:e]
            n0 = int(np.searchsorted(sd, 1))
            if n0 == 0 or n0 == e - s:
                continue
            ca, ch = ids[s:s + n0], hs[s:s + n0]
            db, dh = ids[s + n0:e], hs[s + n0:e]
            d = _popcount64(ch[:, None] ^ dh[None, :])
            ai, bi = np.nonzero(d <= max_hamming)
            if len(ai):
                a_out.append(ca[ai])
                b_out.append(db[bi])
                h_out.append(d[ai, bi].astype(np.int32))
        if not a_out:
            return empty
        return pa.table({"doc_a": pa.array(np.concatenate(a_out), pa.int64()),
                         "doc_b": pa.array(np.concatenate(b_out), pa.int64()),
                         "h": pa.array(np.concatenate(h_out), pa.int32())})

    cross_checked.__name__ = "simhash_delta_cross"
    pairs = keyed_partition_map(union, ["band"], cross_checked)
    return partitioned_aggregate(
        pairs, ["doc_a", "doc_b"], [("h", "min")],
        rename={"h_min": "min(hamming)"},
    )
