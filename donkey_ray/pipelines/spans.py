"""Cross-document duplicated-span detection (exact substring dedup at
token-window granularity, after Lee et al. 2022, "Deduplicating Training
Data Makes Language Models Better" — the k-gram-window formulation used
by map-reduce implementations in place of the paper's suffix array).

Pinned spec (the DuckDB oracle in __ray_entry__ mirrors it exactly):

* Tokens: SimpleTokenizer (``[a-z0-9]+`` runs of lower(text)).
* Windows: every run of ``k`` consecutive tokens within a document
  (positions 0..dl-k); docs with fewer than ``k`` tokens have no
  windows and are omitted from the output.
* A window's gram (the space-joined token sequence) is DUPLICATED when
  it occurs in >= 2 DISTINCT documents. Within-doc repetition alone
  does not make a gram duplicated (that axis is covered by the Gopher
  repetition metrics); once a gram is cross-doc, every one of its
  positions in every doc counts.
* Output: (doc_id, n_windows, n_dup_windows) — integer counts only, so
  the driver's value-hash compare is exact; callers derive the
  duplicated fraction themselves.

Scale shape:

* Map side: tokenize + n-gram windows are batch-local; (gram, doc_id)
  position counts are pre-combined per batch (pyarrow group_by), so a
  span repeated within one doc crosses the wire once. Per-doc window
  totals never shuffle at all (a doc is one row).
* One keyed exchange on the gram string co-locates all owners of a
  gram; per partition a C++ group_by marks grams with >= 2 distinct
  docs and re-keys the surviving rows by doc. This is the honest
  O(total tokens) exchange the operator needs — there is no broadcast
  and no driver-side state, and partition count scales with the
  cluster. (At 10^12 docs the gram STRING key — ~50 B for k=8 — is the
  dominant shuffle cost; swapping it for a 128-bit hash is a pure
  constant-factor trade that gives up string-exactness for ~3x less
  wire volume. The string key is kept here because the conformance
  oracle compares token sequences, not hashes.)
* The per-doc dup counts come back through a doc_id-keyed partial-sum
  exchange (rows <= n_docs x P), then one distributed left join hangs
  them onto the per-doc window totals. Everything after the gram
  exchange is O(n_docs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.tokenize import SimpleTokenizer
from ..stages.exchange import keyed_partition_map, partitioned_aggregate
from .joins import hash_join

_TOK = SimpleTokenizer()


def _windows(batch: pa.Table, text_col: str, k: int):
    """(grams, gram_parent_rows) of a batch, or None when no row has a
    full window. Same construction as analyze._ngram_window, inlined to
    keep this module's pinned spec self-contained."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat, parents, dl = _TOK.tokenize_column(col)
    if len(flat) < k:
        return None, dl
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    w = len(flat) - k + 1
    m = parents[k - 1:] == parents[:w]
    if not m.any():
        return None, dl
    cols = [flat.slice(i, w) for i in range(k)]
    grams = pc.binary_join_element_wise(*cols, " ").filter(pa.array(m))
    return (grams, parents[:w][m]), dl


def duplicated_spans(
    ds: ray.data.Dataset,
    *,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """(doc_id, n_windows, n_dup_windows) per doc with >= 1 window: how
    much of each document is covered by token ``k``-gram spans that also
    appear in at least one OTHER document. The standard exact-substring
    dedup signal for training-data curation (docs with a high duplicated
    fraction are boilerplate / mirrors / vendored copies)."""
    if k < 2:
        raise ValueError("k must be >= 2")

    def gram_doc_counts(batch: pa.Table) -> pa.Table:
        """(gram, doc_id, n_pos) pre-combined per batch."""
        empty = pa.table({"gram": pa.array([], pa.string()),
                          "doc_id": pa.array([], pa.int64()),
                          "n_pos": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        win, _dl = _windows(batch, text_col, k)
        if win is None:
            return empty
        grams, gdoc = win
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        pairs = pa.table({"gram": grams,
                          "doc_id": pa.array(ids[gdoc], pa.int64())})
        out = pairs.group_by(["gram", "doc_id"], use_threads=False).aggregate(
            [("doc_id", "count")]
        )
        return out.rename_columns(["gram", "doc_id", "n_pos"]).set_column(
            2, "n_pos", out.column("doc_id_count").cast(pa.int64())
        )

    def doc_windows(batch: pa.Table) -> pa.Table:
        """(doc_id, n_windows) — complete per row, never shuffles."""
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        _flat, _parents, dl = _TOK.tokenize_column(col)
        nw = np.maximum(dl.astype(np.int64) - (k - 1), 0)
        keep = nw > 0
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(ids[keep], pa.int64()),
                         "n_windows": pa.array(nw[keep], pa.int64())})

    def dup_per_partition(part: pa.Table) -> pa.Table:
        """All rows of a gram are co-located: keep grams with >= 2
        distinct docs, emit per-doc position-count partials."""
        if part.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_dup": pa.array([], pa.int64())})
        per_gram = part.group_by(["gram"], use_threads=False).aggregate(
            [("doc_id", "count_distinct")]
        )
        dup_grams = per_gram.filter(
            pc.greater_equal(per_gram.column("doc_id_count_distinct"), 2)
        ).column("gram")
        hits = part.filter(pc.is_in(part.column("gram"),
                                    value_set=dup_grams.combine_chunks()
                                    if isinstance(dup_grams, pa.ChunkedArray)
                                    else dup_grams))
        out = hits.group_by(["doc_id"], use_threads=False).aggregate(
            [("n_pos", "sum")]
        )
        return out.rename_columns(["doc_id", "n_dup"])

    pairs = ds.map_batches(gram_doc_counts, batch_format="pyarrow",
                           zero_copy_batch=True)
    partials = keyed_partition_map(pairs, ["gram"], dup_per_partition,
                                   num_partitions=num_partitions)
    dup_counts = partitioned_aggregate(
        partials, ["doc_id"], [("n_dup", "sum")],
        num_partitions=num_partitions, rename={"n_dup_sum": "n_dup_windows"},
    )
    totals = ds.map_batches(doc_windows, batch_format="pyarrow",
                            zero_copy_batch=True)
    joined = hash_join(totals, dup_counts, left_on="doc_id",
                       right_on="doc_id", how="left",
                       num_partitions=num_partitions)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_windows": batch.column("n_windows"),
            "n_dup_windows": pc.coalesce(
                batch.column("n_dup_windows"), pa.scalar(0, pa.int64())
            ),
        })

    return joined.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


def _dup_window_starts(
    ds: ray.data.Dataset,
    *,
    k: int,
    id_col: str,
    text_col: str,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """(doc_id, pos) of every window whose gram occurs in >= 2 distinct
    docs — the positional variant of duplicated_spans' gram exchange
    (positions can't be pre-combined, so rows = total windows)."""

    def gram_positions(batch: pa.Table) -> pa.Table:
        empty = pa.table({"gram": pa.array([], pa.string()),
                          "doc_id": pa.array([], pa.int64()),
                          "pos": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        win, _dl = _windows(batch, text_col, k)
        if win is None:
            return empty
        grams, gdoc = win
        # window position within its doc: a doc's windows are contiguous
        # in flat order
        starts = np.concatenate(
            ([0], np.flatnonzero(gdoc[1:] != gdoc[:-1]) + 1))
        runs = np.diff(np.concatenate((starts, [len(gdoc)])))
        pos = np.arange(len(gdoc), dtype=np.int64) - np.repeat(starts, runs)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({"gram": grams,
                         "doc_id": pa.array(ids[gdoc], pa.int64()),
                         "pos": pa.array(pos, pa.int64())})

    def dup_positions(part: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "pos": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        per_gram = part.group_by(["gram"], use_threads=False).aggregate(
            [("doc_id", "count_distinct")]
        )
        dup = per_gram.filter(
            pc.greater_equal(per_gram.column("doc_id_count_distinct"), 2)
        ).column("gram")
        if isinstance(dup, pa.ChunkedArray):
            dup = dup.combine_chunks()
        hits = part.filter(pc.is_in(part.column("gram"), value_set=dup))
        return hits.select(["doc_id", "pos"])

    grams = ds.map_batches(gram_positions, batch_format="pyarrow",
                           zero_copy_batch=True)
    return keyed_partition_map(grams, ["gram"], dup_positions,
                               num_partitions=num_partitions)


def remove_dup_spans(
    ds: ray.data.Dataset,
    *,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """The APPLY step of exact-substring dedup (Lee et al. 2022): delete
    every token covered by at least one cross-doc duplicated k-gram
    window. Output one row per input doc: (doc_id, n_tokens, n_removed,
    cleaned) where ``cleaned`` is the surviving TOKEN stream joined by
    single spaces (token-level removal cannot reconstruct original
    whitespace — pinned; the oracle mirrors it).

    Scale shape: the gram exchange of duplicated_spans (positional
    variant) plus ONE doc-keyed cogroup of (docs x dup-window starts);
    coverage is a difference-array cumsum over the batch's flat token
    stream — window bounds never cross doc boundaries by construction,
    so one global cumsum serves every doc in the partition."""

    starts_ds = _dup_window_starts(
        ds, k=k, id_col=id_col, text_col=text_col,
        num_partitions=num_partitions)

    from ..stages.exchange import keyed_cogroup_map

    def rebuild(docs: pa.Table, dups: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64()),
                          "n_removed": pa.array([], pa.int64()),
                          "cleaned": pa.array([], pa.string())})
        if docs.num_rows == 0:
            return empty
        col = docs.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat, parents, dl = _TOK.tokenize_column(col)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        ids = docs.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc_start = np.concatenate(([0], np.cumsum(dl)))
        total = int(doc_start[-1])
        diff = np.zeros(total + 1, dtype=np.int64)
        if dups.num_rows:
            order = np.argsort(ids, kind="stable")
            d_ids = dups.column("doc_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            rows = order[np.searchsorted(ids[order], d_ids)]
            a = doc_start[rows] + dups.column("pos").to_numpy(
                zero_copy_only=False)
            np.add.at(diff, a, 1)
            np.add.at(diff, a + k, -1)
        covered = np.cumsum(diff[:-1]) > 0
        kept_mask = ~covered
        kept = flat.filter(pa.array(kept_mask))
        kept_counts = np.bincount(parents[kept_mask],
                                  minlength=docs.num_rows)
        offsets = pa.array(
            np.concatenate(([0], np.cumsum(kept_counts))), pa.int32())
        relisted = pa.ListArray.from_arrays(offsets, kept)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(dl.astype(np.int64), pa.int64()),
            "n_removed": pa.array(
                (dl - kept_counts).astype(np.int64), pa.int64()),
            "cleaned": pc.binary_join(relisted, " "),
        })

    return keyed_cogroup_map(
        ds.map_batches(
            lambda b: b.select([id_col, text_col]),
            batch_format="pyarrow", zero_copy_batch=True),
        starts_ds, [id_col], ["doc_id"], rebuild,
        num_partitions=num_partitions)
