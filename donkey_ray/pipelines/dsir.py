"""DSIR data-selection importance weights (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling") — pinned integer spec.

Scores every document by how target-like its hashed-unigram distribution is:

    score(d) = sum over token occurrences of  lt[b(t)] - lr[b(t)]

where b(t) hashes the token into ``DSIR_BUCKETS`` fixed buckets (top 8 bytes
of sha256(term), mod B), and lt / lr are the add-1-smoothed log-likelihoods
of the bucket under the TARGET (docs with lang == target_lang) and RAW (all
docs) unigram distributions:

    l[b] = floor( ln((c_b + 1) / (T + B)) * 1e6 + 0.5 )   (per-bucket BIGINT)

Quantizing each bucket's log-likelihood to x1e6 integers BEFORE the per-doc
sum makes the document score an exact integer sum — no cross-engine float
accumulation exists; the only float op is one ln per bucket per side,
mirrored operand-for-operand in the DuckDB oracle. High scores = looks like
the target domain (resample/filter on them to build a target-like corpus).

Scale shape: ZERO shuffles. Pass 1 reduces each batch to two fixed
B-length count vectors (the legitimately-broadcastable state: B is a
constant, independent of corpus/vocabulary size); the driver folds them in
unbounded Python ints and ships the B-length delta array back in the task
closure. Pass 2 is a pure per-batch map producing (doc_id, score_x1e6).
Token-less docs produce no rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.tokenize import SimpleTokenizer
from ..util import dataset_to_table

_TOK = SimpleTokenizer()

DSIR_BUCKETS = 1024
DSIR_SCALE = 10**6


def _term_buckets(terms: list[str], buckets: int) -> np.ndarray:
    """Bucket per term: big-endian top 8 bytes of sha256(term), mod B."""
    return np.fromiter(
        (int(hashlib.sha256(t.encode("utf-8")).hexdigest()[:16], 16) % buckets
         for t in terms),
        dtype=np.int64, count=len(terms))


def _occurrence_buckets(batch: pa.Table, text_col: str,
                        buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """(per-occurrence bucket ids, parent row indices) for a batch."""
    col = batch.column(text_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat, parents, _dl = _TOK.tokenize_column(col)
    if len(flat) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    enc = flat.dictionary_encode()
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    bk = _term_buckets(enc.dictionary.to_pylist(), buckets)
    return bk[idx], parents.astype(np.int64)


def dsir_weights(
    ds: ray.data.Dataset,
    *,
    target_lang: str = "en",
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    buckets: int = DSIR_BUCKETS,
) -> ray.data.Dataset:
    # pass 1: raw + target bucket-count partials (two B-vectors per batch)
    def count_buckets(batch: pa.Table) -> pa.Table:
        empty = pa.table({"raw": pa.array([], pa.list_(pa.int64())),
                          "tgt": pa.array([], pa.list_(pa.int64()))})
        if batch.num_rows == 0:
            return empty
        bk, parents = _occurrence_buckets(batch, text_col, buckets)
        if len(bk) == 0:
            return empty
        raw = np.bincount(bk, minlength=buckets).astype(np.int64)
        is_t = np.asarray(
            [v == target_lang for v in batch.column(lang_col).to_pylist()],
            dtype=bool)
        tm = is_t[parents]
        tgt = np.bincount(bk[tm], minlength=buckets).astype(np.int64)
        return pa.table({
            "raw": pa.array([raw], pa.list_(pa.int64())),
            "tgt": pa.array([tgt], pa.list_(pa.int64())),
        })

    parts = dataset_to_table(
        ds.map_batches(count_buckets, batch_format="pyarrow",
                       zero_copy_batch=True)
    )
    raw_c = [0] * buckets
    tgt_c = [0] * buckets
    for r in parts.column("raw").to_pylist():
        for i, v in enumerate(r):
            raw_c[i] += v
    for r in parts.column("tgt").to_pylist():
        for i, v in enumerate(r):
            tgt_c[i] += v
    t_raw, t_tgt = sum(raw_c), sum(tgt_c)

    def _loglik(c: list[int], total: int) -> np.ndarray:
        x = (np.asarray(c, dtype=np.float64) + 1.0) / float(total + buckets)
        return np.floor(np.log(x) * DSIR_SCALE + 0.5).astype(np.int64)

    delta = _loglik(tgt_c, t_tgt) - _loglik(raw_c, t_raw)

    # pass 2: shuffle-free per-doc score
    def score(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "score_x1e6": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        bk, parents = _occurrence_buckets(batch, text_col, buckets)
        if len(bk) == 0:
            return empty
        sums = np.zeros(batch.num_rows, dtype=np.int64)
        np.add.at(sums, parents, delta[bk])
        seen = np.zeros(batch.num_rows, dtype=bool)
        seen[parents] = True
        ids = batch.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids[seen]),
            "score_x1e6": pa.array(sums[seen]),
        })

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def _hex64_mod_expr(col: str, mod: int) -> str:
    """DuckDB: (big-endian top 8 bytes of sha256(col)) % mod — built from
    nibble limbs so every partial fits UBIGINT."""
    return (
        "(list_aggregate(list_transform(range(1,17), "
        f"i -> (strpos('0123456789abcdef', substr(sha256({col}), i, 1))::UBIGINT - 1) "
        "* (1::UBIGINT << (4*(16-i)))), 'sum') "
        f"% {mod}::UBIGINT)::BIGINT"
    )


def dsir_oracle_sql(
    *,
    target_lang: str = "en",
    buckets: int = DSIR_BUCKETS,
    table: str = "documents",
) -> str:
    """DuckDB mirror: identical tokenization, bucket hash, per-bucket
    quantized log-likelihoods, and exact-integer per-doc sums."""
    b = _hex64_mod_expr("term", buckets)
    return f"""
WITH tok AS MATERIALIZED (
  SELECT doc_id, lang,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM {table}),
bk AS MATERIALIZED (
  SELECT term, {b} AS b FROM (SELECT DISTINCT term FROM tok)),
tb AS MATERIALIZED (
  SELECT tok.doc_id, tok.lang, bk.b FROM tok JOIN bk USING (term)),
tot AS MATERIALIZED (
  SELECT count(*) AS tr,
         count(*) FILTER (WHERE lang = '{target_lang}') AS tt FROM tb),
cnt AS MATERIALIZED (
  SELECT b, count(*) AS cr,
         count(*) FILTER (WHERE lang = '{target_lang}') AS ct
  FROM tb GROUP BY b),
l AS MATERIALIZED (
  SELECT g.b,
         CAST(floor(ln((COALESCE(cnt.ct, 0) + 1.0)
                       / ((SELECT tt FROM tot) + {buckets}.0))
                    * {DSIR_SCALE} + 0.5) AS BIGINT)
       - CAST(floor(ln((COALESCE(cnt.cr, 0) + 1.0)
                       / ((SELECT tr FROM tot) + {buckets}.0))
                    * {DSIR_SCALE} + 0.5) AS BIGINT) AS d
  FROM (SELECT unnest(generate_series(0, {buckets - 1})) AS b) g
  LEFT JOIN cnt ON cnt.b = g.b)
SELECT tb.doc_id, SUM(l.d)::BIGINT AS score_x1e6
FROM tb JOIN l USING (b)
GROUP BY tb.doc_id
ORDER BY tb.doc_id"""
