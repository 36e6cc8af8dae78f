"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") — the
tokenizer-training step of an LLM data pipeline, built Ray-Data-first.

Pinned spec (the DuckDB oracle in __ray_entry__ mirrors every step):

* Words: SimpleTokenizer tokens (``[a-z0-9]+`` runs of lower(text));
  word count = total corpus occurrences (all docs summed).
* Initial symbols: the word's characters (no end-of-word marker).
* Each round: pair count of adjacent symbols (l, r) = sum over UNIQUE
  words of cnt x (number of adjacent occurrences, overlapping included
  — "aaa" contributes 2 to ("a","a")).  Best pair = max count, ties by
  (lhs asc, rhs asc).  The merge is applied greedy left-to-right: only
  identical pairs can self-overlap, so within each maximal run of
  consecutive occurrences exactly the even offsets merge.
* ``num_merges`` rounds, stopping early when no pair remains.

Scale shape (why this is cheap at 100 TB):

* The corpus is read ONCE — the word-count pass (per-batch pyarrow
  partial counts -> one keyed exchange).  Training then runs on the
  UNIQUE-WORD table (the classic BPE working set; orders of magnitude
  smaller than the corpus and still a distributed Dataset, never
  driver-side).
* Per round: per-batch weighted pair partials (dictionary-encoded
  symbol ids, packed-uint64 pair keys) -> one keyed exchange -> ONE
  argmax row per partition -> driver argmax over P rows.  The pair
  table is bounded by distinct adjacent symbol pairs, not corpus size.
* The merge apply is a pure shuffle-free map over the working set; the
  working set is re-materialized per round (bounded by construction)
  so round r+1 does not re-execute rounds 1..r.
* Encoding ships the tiny merge table once and streams the corpus
  through a single map — R vectorized passes per batch, no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.tokenize import SimpleTokenizer
from ..stages.exchange import partitioned_aggregate
from ..util import dataset_to_table

_TOK = SimpleTokenizer()

MERGES_SCHEMA = pa.schema([
    ("merge_round", pa.int64()),
    ("lhs", pa.string()),
    ("rhs", pa.string()),
    ("pair_count", pa.int64()),
])


def word_count_table(ds: ray.data.Dataset, *, text_col: str = "text"
                     ) -> ray.data.Dataset:
    """(word, cnt) global occurrence counts — per-batch pyarrow partial
    counts, one keyed exchange; the token stream itself never shuffles."""

    def explode_count(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat, _, _ = _TOK.tokenize_column(col)
        t = pa.table({"word": flat}).group_by(
            ["word"], use_threads=False
        ).aggregate([("word", "count")])
        return pa.table({
            "word": t.column("word").cast(pa.string()),
            "cnt": t.column("word_count").cast(pa.int64()),
        })

    return partitioned_aggregate(
        ds.map_batches(explode_count, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["word"], [("cnt", "sum")], rename={"cnt_sum": "cnt"},
    )


def _char_lists(arr) -> pa.ListArray:
    """Vectorized char-explode: string array -> list<string> of 1-char
    symbols.  Tokenizer words are ASCII ([a-z0-9]+ by pinned spec), so
    byte == char and the split is pure buffer arithmetic — no Python
    loop over rows."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n_words = len(arr)
    if n_words == 0:
        return pa.array([], pa.list_(pa.string()))
    offs = np.frombuffer(arr.buffers()[1], np.int32)[
        arr.offset: arr.offset + n_words + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    start, stop = int(offs[0]), int(offs[-1])
    chunk = data[start:stop]
    n = stop - start
    chars = pa.StringArray.from_buffers(
        n,
        pa.py_buffer(np.arange(n + 1, dtype=np.int32).tobytes()),
        pa.py_buffer(chunk.tobytes()),
    )
    word_offs = pa.array((offs - start).astype(np.int32), pa.int32())
    return pa.ListArray.from_arrays(word_offs, chars)


def _to_symbols(words: ray.data.Dataset) -> ray.data.Dataset:
    """Working set: (cnt:int64, syms:list<string>) — one row per unique
    word, symbols initialised to its characters."""

    def split(batch: pa.Table) -> pa.Table:
        return pa.table({
            "cnt": batch.column("cnt").cast(pa.int64()),
            "syms": _char_lists(batch.column("word")),
        })

    return words.map_batches(split, batch_format="pyarrow",
                             zero_copy_batch=True)


def _flat_syms(batch: pa.Table):
    """Flatten the syms list column -> (dictionary-encoded indices,
    per-symbol parent row, dictionary values, per-row counts)."""
    col = batch.column("syms")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten()
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parents = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
    enc = flat.dictionary_encode()
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dic = enc.dictionary
    cnt = batch.column("cnt").to_numpy(zero_copy_only=False)
    return idx, parents.astype(np.int64), dic, cnt.astype(np.int64)


_EMPTY_PAIRS = pa.table({
    "lhs": pa.array([], pa.string()),
    "rhs": pa.array([], pa.string()),
    "c": pa.array([], pa.int64()),
})


def _pair_partials(batch: pa.Table) -> pa.Table:
    """Per-batch weighted adjacent-pair counts over the working set."""
    if batch.num_rows == 0:
        return _EMPTY_PAIRS
    idx, par, dic, cnt = _flat_syms(batch)
    if len(idx) < 2:
        return _EMPTY_PAIRS
    m = par[:-1] == par[1:]
    if not m.any():
        return _EMPTY_PAIRS
    nd = np.int64(len(dic))
    keys = idx[:-1][m] * nd + idx[1:][m]
    wt = cnt[par[:-1][m]]
    uk, inv = np.unique(keys, return_inverse=True)
    c = np.bincount(inv, weights=wt.astype(np.float64)).astype(np.int64)
    take_l = pa.array(uk // nd, pa.int64())
    take_r = pa.array(uk % nd, pa.int64())
    return pa.table({
        "lhs": dic.take(take_l),
        "rhs": dic.take(take_r),
        "c": pa.array(c, pa.int64()),
    })


def _best_pair(work: ray.data.Dataset) -> tuple[str, str, int] | None:
    """Global argmax pair by (count desc, lhs asc, rhs asc): after the
    keyed exchange each pair appears exactly once, so per-partition
    argmax + a driver argmax over P candidate rows is exact."""
    sums = partitioned_aggregate(
        work.map_batches(_pair_partials, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["lhs", "rhs"], [("c", "sum")], rename={"c_sum": "c"},
    )

    def local_best(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part
        order = pc.sort_indices(part, sort_keys=[
            ("c", "descending"), ("lhs", "ascending"), ("rhs", "ascending")])
        return part.take(order.slice(0, 1))

    cand = dataset_to_table(
        sums.map_batches(local_best, batch_format="pyarrow",
                         zero_copy_batch=True))
    if cand.num_rows == 0:
        return None
    order = pc.sort_indices(cand, sort_keys=[
        ("c", "descending"), ("lhs", "ascending"), ("rhs", "ascending")])
    row = cand.take(order.slice(0, 1))
    return (row.column("lhs")[0].as_py(), row.column("rhs")[0].as_py(),
            row.column("c")[0].as_py())


def _merge_positions(idx: np.ndarray, par: np.ndarray,
                     ai: int, bi: int) -> np.ndarray:
    """Greedy left-to-right merge starts for pair (ai, bi) over the flat
    symbol stream: all matches, except that within each maximal run of
    CONSECUTIVE matches (possible only when ai == bi) only even offsets
    merge — exactly the sequential left-to-right scan, vectorized."""
    m = (idx[:-1] == ai) & (idx[1:] == bi) & (par[:-1] == par[1:])
    t = np.flatnonzero(m)
    if len(t) == 0:
        return t
    first = np.r_[True, np.diff(t) != 1]
    run_id = np.cumsum(first) - 1
    run_start = t[first][run_id]
    return t[(t - run_start) % 2 == 0]


def _apply_merge_batch(batch: pa.Table, a: str, b: str) -> pa.Table:
    """Apply one merge to the working set batch (pure map)."""
    if batch.num_rows == 0:
        return batch
    idx, par, dic, cnt = _flat_syms(batch)
    ai = dic.index(a).as_py() if len(dic) else -1
    bi = dic.index(b).as_py() if len(dic) else -1
    sel = (np.empty(0, np.int64) if ai < 0 or bi < 0 or len(idx) < 2
           else _merge_positions(idx, par, ai, bi))
    if len(sel) == 0:
        return batch
    dic_new = pa.concat_arrays([
        dic.combine_chunks() if isinstance(dic, pa.ChunkedArray) else dic,
        pa.array([a + b], pa.string()),
    ])
    idx = idx.copy()
    idx[sel] = len(dic_new) - 1
    keep = np.ones(len(idx), bool)
    keep[sel + 1] = False
    idx, par = idx[keep], par[keep]
    lengths = np.bincount(par, minlength=batch.num_rows)
    offsets = np.zeros(batch.num_rows + 1, np.int64)
    np.cumsum(lengths, out=offsets[1:])
    values = dic_new.take(pa.array(idx, pa.int64()))
    syms = pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int32), pa.int32()), values)
    return pa.table({"cnt": batch.column("cnt"), "syms": syms})


def bpe_train(ds: ray.data.Dataset, *, num_merges: int = 10,
              text_col: str = "text") -> pa.Table:
    """Learn ``num_merges`` BPE merges over the corpus; returns the merge
    table (merge_round, lhs, rhs, pair_count) in learning order."""
    work = _to_symbols(word_count_table(ds, text_col=text_col)).materialize()
    rounds, lhss, rhss, counts = [], [], [], []
    for r in range(1, num_merges + 1):
        best = _best_pair(work)
        if best is None:
            break
        a, bsym, c = best
        rounds.append(r)
        lhss.append(a)
        rhss.append(bsym)
        counts.append(c)
        if r < num_merges:
            def apply(batch: pa.Table, a=a, b=bsym) -> pa.Table:
                return _apply_merge_batch(batch, a, b)

            # the working set is unique-word-bounded BY CONSTRUCTION, so
            # re-materializing per round is O(vocab), not O(corpus), and
            # keeps round r+1 from re-executing rounds 1..r
            work = work.map_batches(
                apply, batch_format="pyarrow", zero_copy_batch=True
            ).materialize()
    return pa.table({
        "merge_round": pa.array(rounds, pa.int64()),
        "lhs": pa.array(lhss, pa.string()),
        "rhs": pa.array(rhss, pa.string()),
        "pair_count": pa.array(counts, pa.int64()),
    })


def bpe_encode_counts(ds: ray.data.Dataset, merges: pa.Table, *,
                      text_col: str = "text", id_col: str = "doc_id"
                      ) -> ray.data.Dataset:
    """(doc_id, n_words, n_bpe_tokens): per-doc token counts after
    applying the learned merges in order.  The merge table ships once
    (ray.put); the corpus streams through one shuffle-free map with R
    vectorized merge passes per batch."""
    pairs = list(zip(merges.column("lhs").to_pylist(),
                     merges.column("rhs").to_pylist()))
    mref = ray.put(pairs)

    def encode(batch: pa.Table) -> pa.Table:
        plist = ray.get(mref)
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat_words, word_doc, _ = _TOK.tokenize_column(col)
        n_docs = batch.num_rows
        if len(flat_words) == 0:
            return pa.table({
                "doc_id": batch.column(id_col).cast(pa.int64()),
                "n_words": pa.array(np.zeros(n_docs, np.int64)),
                "n_bpe_tokens": pa.array(np.zeros(n_docs, np.int64)),
            })
        word_doc = np.asarray(word_doc, dtype=np.int64)
        # per-word character streams: parent = word ordinal in the batch
        syms = pa.table({
            "cnt": pa.array(np.ones(len(flat_words), np.int64)),
            "syms": _char_lists(flat_words),
        })
        for a, b in plist:
            syms = _apply_merge_batch(syms, a, b)
        col2 = syms.column("syms")
        if isinstance(col2, pa.ChunkedArray):
            col2 = col2.combine_chunks()
        per_word = pc.list_value_length(col2).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_tok = np.bincount(word_doc, weights=per_word.astype(np.float64),
                            minlength=n_docs).astype(np.int64)
        n_words = np.bincount(word_doc, minlength=n_docs).astype(np.int64)
        return pa.table({
            "doc_id": batch.column(id_col).cast(pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "n_bpe_tokens": pa.array(n_tok, pa.int64()),
        })

    return ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)


# ---- DuckDB oracle (unrolled rounds; mirrors the pinned spec) ----

def _bpe_round_ctes(num_merges: int, *, table: str = "documents",
                    text_col: str = "text") -> str:
    """CTE chain: wc (word counts), s0 (char symbols), then per round r:
    t{r} (adjacency via lead/row_number windows), best{r} (argmax pair),
    mm{r}/sel{r} (greedy-merge starts: gaps-and-islands + even offsets —
    the same run-parity rule as _merge_positions), s{r} (state after the
    merge).  All round CTEs are MATERIALIZED: t{r} is referenced three
    times and naive inlining would blow up exponentially across rounds."""
    parts = [f"""wc AS MATERIALIZED (
  SELECT s AS word, count(*)::BIGINT AS cnt FROM (
    SELECT unnest(regexp_extract_all(lower({text_col}), '[a-z0-9]+')) AS s
    FROM {table}) GROUP BY 1),
s0 AS MATERIALIZED (
  SELECT word AS w, cnt, i, substr(word, i, 1) AS sym
  FROM wc, unnest(generate_series(1, length(word))) AS t(i))"""]
    for r in range(1, num_merges + 1):
        parts.append(f"""
t{r} AS MATERIALIZED (
  SELECT w, cnt, i, sym,
         lead(sym) OVER (PARTITION BY w ORDER BY i) AS nxt,
         row_number() OVER (PARTITION BY w ORDER BY i) AS rn
  FROM s{r - 1}),
best{r} AS MATERIALIZED (
  SELECT sym AS l, nxt AS r2, sum(cnt)::BIGINT AS c
  FROM t{r} WHERE nxt IS NOT NULL GROUP BY 1, 2
  ORDER BY c DESC, l ASC, r2 ASC LIMIT 1),
mm{r} AS MATERIALIZED (
  SELECT t.w, t.rn,
         t.rn - row_number() OVER (PARTITION BY t.w ORDER BY t.rn) AS isl
  FROM t{r} t, best{r} b WHERE t.sym = b.l AND t.nxt = b.r2),
sel{r} AS MATERIALIZED (
  SELECT w, rn FROM (
    SELECT w, rn, row_number() OVER (PARTITION BY w, isl ORDER BY rn) AS o
    FROM mm{r}) WHERE (o - 1) % 2 = 0),
s{r} AS MATERIALIZED (
  SELECT t.w, t.cnt, t.rn AS i,
         CASE WHEN sl.rn IS NOT NULL THEN t.sym || t.nxt ELSE t.sym END AS sym
  FROM t{r} t
  LEFT JOIN sel{r} sl ON sl.w = t.w AND sl.rn = t.rn
  LEFT JOIN sel{r} sp ON sp.w = t.w AND sp.rn = t.rn - 1
  WHERE sp.rn IS NULL)""")
    return ",".join(parts)


def bpe_merges_oracle_sql(num_merges: int) -> str:
    ctes = _bpe_round_ctes(num_merges)
    selects = "\nUNION ALL ".join(
        f"SELECT {r}::BIGINT AS merge_round, l AS lhs, r2 AS rhs, "
        f"c AS pair_count FROM best{r}"
        for r in range(1, num_merges + 1))
    return f"WITH {ctes}\n{selects}"


def bpe_encode_oracle_sql(num_merges: int) -> str:
    ctes = _bpe_round_ctes(num_merges)
    return f"""WITH {ctes},
wsym AS MATERIALIZED (
  SELECT w, count(*)::BIGINT AS k FROM s{num_merges} GROUP BY 1),
docw AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
  FROM documents)
SELECT d.doc_id, count(dw.w)::BIGINT AS n_words,
       coalesce(sum(ws.k), 0)::BIGINT AS n_bpe_tokens
FROM documents d
LEFT JOIN docw dw ON dw.doc_id = d.doc_id
LEFT JOIN wsym ws ON ws.w = dw.w
GROUP BY 1
"""
