"""Bigram language-model training + perplexity scoring (KenLM-style
quality filtering for LLM training data).

Pinned spec (the DuckDB oracle in __ray_entry__ mirrors it exactly):

* Tokens: SimpleTokenizer (``[a-z0-9]+`` runs of lower(text)).
* Vocabulary: the top ``vocab_size`` terms by global occurrence count
  (ties broken by term ascending); every other token maps to a single
  ``<unk>`` bucket.  Model size ``Vm = |vocab| + 1`` (the unk bucket is
  always counted, even when no token is OOV).
* Bigrams: adjacent token pairs within a document, over the
  vocab-mapped stream (so ``<unk>`` participates like a normal word).
* Model: add-one (Laplace) smoothing over bigram continuations,
  ``P(w2 | w1) = (c(w1,w2) + 1) / (cp(w1) + Vm)`` where ``c`` is the
  corpus bigram count and ``cp(w1) = sum_w2 c(w1,w2)`` is the bigram
  *prefix* count.
* Per-doc score: cross-entropy ``ce = -mean(ln P)`` over the doc's
  bigrams, reported quantized (``ce_x1000`` int64, round-half-even)
  because cross-engine double summation differs in late ulps.  Docs
  with fewer than two tokens have no bigrams and are omitted.

Scale shape (the reason this is built as two passes + a broadcast):

* Pass 1 (vocab): per-batch partial unigram counts (pyarrow group_by)
  -> one keyed exchange over (term) partials -> per-block top-V
  pre-prune -> driver merges only O(blocks x V) rows.  The token
  stream itself never shuffles.
* Pass 2 (bigram counts): tokens are mapped to dense vocab ids inside
  each batch, bigram keys packed into one uint64, partial-counted per
  batch, then one keyed exchange.  The LM table is bounded by
  min(distinct corpus bigrams, Vm^2) BY CONSTRUCTION — vocab pruning
  is what makes the model broadcastable at 100 TB (Vm=65k -> <=4.3e9
  worst case, real corpora are far sparser; Vm=4k -> <=16M).
* Scoring: the finished LM (sorted key array + counts + dense prefix
  counts) is ``ray.put`` once and read zero-copy by every scoring
  task; the corpus streams through shuffle-free.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.tokenize import SimpleTokenizer
from ..stages.exchange import partitioned_aggregate
from ..util import dataset_to_table

_TOK = SimpleTokenizer()


def _tokens(batch: pa.Table, text_col: str):
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return _TOK.tokenize_column(col)


@dataclass
class BigramLM:
    """Finished model: ids are positions in the term-sorted ``vocab``
    (+1; id 0 is ``<unk>``); ``keys`` is the sorted packed bigram key
    array ``w1 * Vm + w2`` with per-key ``counts``; ``prefix`` is the
    dense cp(w1) array of length Vm."""

    vocab: pa.Array          # term-ascending string array, len V
    keys: np.ndarray         # uint64, sorted
    counts: np.ndarray       # int64, aligned with keys
    prefix: np.ndarray       # int64, len Vm

    @property
    def vm(self) -> int:
        return len(self.vocab) + 1


def _map_ids(flat: pa.Array, vocab: pa.Array) -> np.ndarray:
    """Token strings -> vocab ids (0 = <unk>), vectorized."""
    idx = pc.index_in(flat, value_set=vocab)
    ids = np.asarray(idx.fill_null(-1).to_numpy(zero_copy_only=False), dtype=np.int64)
    return ids + 1  # null/-1 -> 0 (<unk>), vocab position i -> i+1


def _bigram_keys(ids: np.ndarray, parents: np.ndarray, vm: int):
    """Packed uint64 bigram keys for adjacent same-doc token pairs;
    returns (keys, bigram_parent_rows)."""
    if len(ids) < 2:
        return (np.empty(0, np.uint64), np.empty(0, np.int64))
    m = parents[1:] == parents[:-1]
    w1 = ids[:-1][m].astype(np.uint64)
    w2 = ids[1:][m].astype(np.uint64)
    return w1 * np.uint64(vm) + w2, parents[:-1][m]


def train_vocab(ds: ray.data.Dataset, *, vocab_size: int,
                text_col: str = "text") -> pa.Array:
    """Top-``vocab_size`` terms by (count desc, term asc), returned
    term-ascending.  Exact: per-batch partials -> keyed exchange -> one
    row per term -> per-block top-V pre-prune -> driver top-V (top-V of
    a union is contained in the union of per-subset top-Vs)."""

    def explode_count(batch: pa.Table) -> pa.Table:
        flat, _, _ = _tokens(batch, text_col)
        t = pa.table({"term": flat}).group_by(
            ["term"], use_threads=False
        ).aggregate([("term", "count")])
        return pa.table({
            "term": t.column("term").cast(pa.string()),
            "c": t.column("term_count").cast(pa.int64()),
        })

    counts = partitioned_aggregate(
        ds.map_batches(explode_count, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["term"], [("c", "sum")], rename={"c_sum": "c"},
    )

    def local_top(part: pa.Table) -> pa.Table:
        if part.num_rows <= vocab_size:
            return part
        order = pc.sort_indices(
            part, sort_keys=[("c", "descending"), ("term", "ascending")]
        )
        return part.take(order.slice(0, vocab_size))

    pruned = dataset_to_table(
        counts.map_batches(local_top, batch_format="pyarrow",
                           zero_copy_batch=True)
    )
    order = pc.sort_indices(
        pruned, sort_keys=[("c", "descending"), ("term", "ascending")]
    )
    top = pruned.take(order.slice(0, vocab_size))
    terms = top.column("term").combine_chunks()
    return terms.take(pc.array_sort_indices(terms))


def train_bigram_lm(ds: ray.data.Dataset, *, vocab_size: int = 4096,
                    text_col: str = "text") -> BigramLM:
    """Two-pass distributed training; returns the broadcastable model."""
    vocab = train_vocab(ds, vocab_size=vocab_size, text_col=text_col)
    vm = len(vocab) + 1
    vref = ray.put(vocab)

    def bigram_partials(batch: pa.Table) -> pa.Table:
        voc = ray.get(vref)
        flat, parents, _ = _tokens(batch, text_col)
        keys, _ = _bigram_keys(_map_ids(flat, voc), parents, vm)
        if len(keys) == 0:
            return pa.table({"k": pa.array([], pa.uint64()),
                             "c": pa.array([], pa.int64())})
        uk, cnt = np.unique(keys, return_counts=True)
        return pa.table({"k": pa.array(uk, pa.uint64()),
                         "c": pa.array(cnt.astype(np.int64), pa.int64())})

    lm_tbl = dataset_to_table(
        partitioned_aggregate(
            ds.map_batches(bigram_partials, batch_format="pyarrow",
                           zero_copy_batch=True),
            ["k"], [("c", "sum")], rename={"c_sum": "c"},
        )
    )
    keys = lm_tbl.column("k").to_numpy(zero_copy_only=False).astype(np.uint64)
    cnts = lm_tbl.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(keys)
    keys, cnts = keys[order], cnts[order]
    prefix = np.bincount((keys // np.uint64(vm)).astype(np.int64),
                         weights=cnts, minlength=vm).astype(np.int64)
    return BigramLM(vocab=vocab, keys=keys, counts=cnts, prefix=prefix)


def perplexity_scores(ds: ray.data.Dataset, lm: BigramLM, *,
                      text_col: str = "text",
                      id_col: str = "doc_id",
                      carry_cols: tuple[str, ...] = ()) -> ray.data.Dataset:
    """(doc_id, n_bigrams, ce_x1000, *carry_cols): per-doc bigram
    cross-entropy under ``lm``.  The model is shipped once (ray.put) and
    the corpus streams through a single shuffle-free map; ``carry_cols``
    ride through untouched (e.g. lang for downstream per-lang cuts)."""
    vm = lm.vm
    lmref = ray.put((lm.vocab, lm.keys, lm.counts, lm.prefix))

    def score(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_bigrams": pa.array([], pa.int64()),
            "ce_x1000": pa.array([], pa.int64()),
            **{c: batch.column(c).slice(0, 0) for c in carry_cols},
        })
        voc, keys, cnts, prefix = ray.get(lmref)
        flat, parents, _ = _tokens(batch, text_col)
        ids = _map_ids(flat, voc)
        bkeys, bparents = _bigram_keys(ids, parents, vm)
        if len(bkeys) == 0:
            return empty
        pos = np.searchsorted(keys, bkeys)
        pos_c = np.clip(pos, 0, len(keys) - 1)
        c = np.where(keys[pos_c] == bkeys, cnts[pos_c], 0)
        w1 = (bkeys // np.uint64(vm)).astype(np.int64)
        lp = np.log((c + 1.0) / (prefix[w1] + float(vm)))
        n = batch.num_rows
        sums = np.bincount(bparents, weights=lp, minlength=n)
        nb = np.bincount(bparents, minlength=n)
        rows = np.flatnonzero(nb > 0)
        ce = -sums[rows] / nb[rows]
        take = pa.array(rows, pa.int64())
        return pa.table({
            "doc_id": batch.column(id_col).cast(pa.int64()).take(take),
            "n_bigrams": pa.array(nb[rows].astype(np.int64), pa.int64()),
            "ce_x1000": pc.round(
                pa.array(ce * 1000.0, pa.float64())
            ).cast(pa.int64()),
            **{c: batch.column(c).take(take) for c in carry_cols},
        })

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def ccnet_buckets(
    ds: ray.data.Dataset,
    lm: BigramLM,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> ray.data.Dataset:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): per
    LANGUAGE, split docs into head / middle / tail by exact perplexity
    tertiles — the standard "keep head+middle, drop tail" quality gate
    of a crawl-curation pipeline.

    Pinned rule: within each lang, rank by (ce_x1000 asc, doc_id asc);
    bucket_index = ((rank - 1) * 3) // n — EXACT thirds (integer rank
    cuts, the stratified_split treatment), not expected-value sampling,
    so the SQL oracle mirrors it with row_number/count windows. Docs
    with < 2 tokens have no bigrams and are omitted (perplexity_scores
    contract). Output: (doc_id, lang, ce_x1000, bucket).

    Scale shape: scoring is the shuffle-free perplexity map; only the
    (doc_id, lang, ce_x1000) projection (~24 B/row) enters the ONE
    lang-keyed exchange, and the per-partition pass is a lexsort +
    segmented arange. Rank-exact tertiles need a lang's projection
    co-located — the same caveat (and the same mix_sample /
    approx-quantile-threshold fallbacks) as stratified_split."""
    from ..stages.exchange import keyed_partition_map

    scored = perplexity_scores(
        ds, lm, text_col=text_col, id_col=id_col, carry_cols=(lang_col,)
    ).select_columns(["doc_id", lang_col, "ce_x1000"])

    names = pa.array(["head", "middle", "tail"], pa.string())

    def per_partition(part: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            lang_col: pa.array([], pa.string()),
            "ce_x1000": pa.array([], pa.int64()),
            "bucket": pa.array([], pa.string()),
        })
        if part.num_rows == 0:
            return empty
        grp = part.column(lang_col)
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        enc = grp.dictionary_encode()
        gi = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = part.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        ce = part.column("ce_x1000").to_numpy(
            zero_copy_only=False).astype(np.int64)
        o = np.lexsort((ids, ce, gi))
        gi_s = gi[o]
        starts = np.concatenate(
            ([0], np.flatnonzero(gi_s[1:] != gi_s[:-1]) + 1))
        lens = np.diff(np.concatenate((starts, [len(gi_s)])))
        rn = np.arange(len(gi_s)) - np.repeat(starts, lens)  # rank - 1
        bidx = (rn * 3) // np.repeat(lens, lens)
        take = pa.array(o)
        return pa.table({
            "doc_id": pa.array(ids[o], pa.int64()),
            lang_col: grp.take(take),
            "ce_x1000": pa.array(ce[o], pa.int64()),
            "bucket": names.take(pa.array(bidx, pa.int64())),
        })

    per_partition.__name__ = "ccnet_buckets"
    return keyed_partition_map(scored, [lang_col], per_partition)
