"""SIF document embeddings (Arora et al. 2017, "A Simple but Tough-to-Beat
Baseline for Sentence Embeddings") — pinned integer spec.

Bridges the documents table to a dense embedding without a model: each doc's
vector is the frequency-weighted average of deterministic per-term sign
vectors,

    e_j(d) = floor( sum_t m_t * w_t * s_{t,j}  /  |d| )

* tokens: the pinned simple tokenizer (== ``regexp_extract_all(lower(text),
  '[a-z0-9]+')``), m_t = in-doc occurrences, |d| = total tokens of the doc.
* SIF weight, exact rational pinned to integers: with T = corpus token
  count and A = max(1, T // 10000) (a ~ 1e-4 of corpus mass),
  w_t = (1_000_000 * A) // (A + c_t) where c_t = corpus-wide count of t.
* Sign vectors from the term's sha256: s_{t,j} = +1 if hex nibble j of
  sha256(term) >= 8 else -1 (j = 1..dim, dim <= 64).
* The final division floors toward -inf on both engines (numpy
  floor_divide == Python ``//``; DuckDB trunc-div is remainder-corrected
  in the oracle).

Output: (doc_id, dim 1-based, e_x1e6) — one row per doc per dimension;
token-less docs produce no rows.

Scale shape: ONE term-keyed exchange makes c_t partition-local (the
vocabulary is never driver-side or broadcast), ONE doc-keyed exchange sums
contribution vectors per doc (|d| is recomputed there — all of a doc's rows
co-locate, so no extra dl join ships). The only driver scalars are T and A
(a one-number-per-batch count pass). int64 note: 1e6 * A overflows int64
only past ~9e16 corpus tokens (~450 TB of text); the weight stage would
need uint128 limbs there.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.tokenize import SimpleTokenizer
from ..stages.exchange import keyed_partition_map
from ..util import dataset_to_table

_TOK = SimpleTokenizer()

SIF_SCALE = 10**6
SIF_A_DIV = 10_000
SIF_DIM = 16


def _term_signs(terms: list[str], dim: int) -> np.ndarray:
    """(len(terms), dim) int64 of +-1 from each term's sha256 nibbles."""
    out = np.empty((len(terms), dim), dtype=np.int64)
    for r, t in enumerate(terms):
        h = hashlib.sha256(t.encode("utf-8")).hexdigest()
        out[r] = [1 if int(h[j], 16) >= 8 else -1 for j in range(dim)]
    return out


def sif_embeddings(
    ds: ray.data.Dataset,
    *,
    dim: int = SIF_DIM,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    if not 1 <= dim <= 64:
        raise ValueError("dim must be in 1..64 (sha256 nibbles)")

    # pass 1: corpus token count T -> pinned weight denominator offset A
    def count_tokens(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat, _parents, _dl = _TOK.tokenize_column(col)
        return pa.table({"n": pa.array([len(flat)], pa.int64())})

    totals = dataset_to_table(
        ds.map_batches(count_tokens, batch_format="pyarrow",
                       zero_copy_batch=True)
    )
    t_total = sum(totals.column("n").to_pylist())
    a = max(1, t_total // SIF_A_DIV)

    # pass 2: (term, doc_id, m) partials — docs live in one row, so the
    # pairs are globally unique and per-partition sums are global sums
    def tf_rows(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat, parents, _dl = _TOK.tokenize_column(col)
        ids = batch.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        t = pa.table({"term": flat,
                      "doc_id": pa.array(ids[parents], pa.int64())})
        g = t.group_by(["term", "doc_id"], use_threads=False).aggregate(
            [("doc_id", "count")])
        return pa.table({"term": g.column("term"),
                         "doc_id": g.column("doc_id"),
                         "m": g.column("doc_id_count").cast(pa.int64())})

    def attach_w(part: pa.Table) -> pa.Table:
        """Term-keyed: c_t = sum(m) over the term's co-located rows;
        w_t = (1e6 * A) // (A + c_t), attached per row."""
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "term": pa.array([], pa.string()),
                          "m": pa.array([], pa.int64()),
                          "w": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        enc_src = part.column("term")
        if isinstance(enc_src, pa.ChunkedArray):
            enc_src = enc_src.combine_chunks()
        enc = enc_src.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        m = part.column("m").to_numpy(zero_copy_only=False)
        c = np.zeros(len(enc.dictionary), dtype=np.int64)
        np.add.at(c, idx, m)
        w = (SIF_SCALE * a) // (a + c)
        return pa.table({
            "doc_id": part.column("doc_id"),
            "term": part.column("term"),
            "m": part.column("m"),
            "w": pa.array(w[idx], pa.int64()),
        })

    def fold_docs(part: pa.Table) -> pa.Table:
        """Doc-keyed: all of a doc's rows co-locate — sum m*w*sign per
        dim, divide by |d| = sum(m), floor toward -inf."""
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "dim": pa.array([], pa.int64()),
                          "e_x1e6": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        enc_src = part.column("term")
        if isinstance(enc_src, pa.ChunkedArray):
            enc_src = enc_src.combine_chunks()
        enc = enc_src.dictionary_encode()
        tidx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        signs = _term_signs(enc.dictionary.to_pylist(), dim)
        denc_src = part.column("doc_id")
        if isinstance(denc_src, pa.ChunkedArray):
            denc_src = denc_src.combine_chunks()
        denc = denc_src.dictionary_encode()
        didx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        docs = denc.dictionary.to_numpy(zero_copy_only=False).astype(np.int64)
        m = part.column("m").to_numpy(zero_copy_only=False)
        w = part.column("w").to_numpy(zero_copy_only=False)
        num = np.zeros((len(docs), dim), dtype=np.int64)
        np.add.at(num, didx, (m * w)[:, None] * signs[tidx])
        dl = np.zeros(len(docs), dtype=np.int64)
        np.add.at(dl, didx, m)
        e = np.floor_divide(num, dl[:, None])
        return pa.table({
            "doc_id": pa.array(np.repeat(docs, dim)),
            "dim": pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64),
                                    len(docs))),
            "e_x1e6": pa.array(e.ravel()),
        })

    tf = ds.map_batches(tf_rows, batch_format="pyarrow", zero_copy_batch=True)
    weighted = keyed_partition_map(tf, ["term"], attach_w,
                                   num_partitions=num_partitions)
    return keyed_partition_map(weighted, ["doc_id"], fold_docs,
                               num_partitions=num_partitions)


def sif_oracle_sql(dim: int = SIF_DIM, *, table: str = "documents") -> str:
    """DuckDB mirror: identical tokenization, weights, signs, and the
    remainder-corrected floor division (dl > 0 always)."""
    return f"""
WITH tok AS MATERIALIZED (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM {table}),
tf AS MATERIALIZED (
  SELECT doc_id, term, count(*)::HUGEINT AS m FROM tok GROUP BY 1, 2),
ct AS MATERIALIZED (SELECT term, sum(m) AS c FROM tf GROUP BY 1),
aa AS MATERIALIZED (
  SELECT greatest(1::HUGEINT, sum(c) // {SIF_A_DIV}) AS a FROM ct),
w AS MATERIALIZED (
  SELECT term, ({SIF_SCALE} * (SELECT a FROM aa))
               // ((SELECT a FROM aa) + c) AS w FROM ct),
sgn AS MATERIALIZED (
  SELECT term, j,
         CASE WHEN strpos('0123456789abcdef',
                          substr(sha256(term), j, 1)) - 1 >= 8
              THEN 1 ELSE -1 END AS s
  FROM (SELECT DISTINCT term FROM tf),
       unnest(generate_series(1, {dim})) AS u(j)),
dl AS MATERIALIZED (SELECT doc_id, sum(m) AS dl FROM tf GROUP BY 1),
contrib AS MATERIALIZED (
  SELECT tf.doc_id, sgn.j, sum(tf.m * w.w * sgn.s) AS num
  FROM tf JOIN w USING (term) JOIN sgn USING (term) GROUP BY 1, 2)
SELECT c.doc_id, c.j::BIGINT AS dim,
       (CASE WHEN c.num % d.dl <> 0 AND c.num < 0
             THEN c.num // d.dl - 1 ELSE c.num // d.dl END)::BIGINT AS e_x1e6
FROM contrib c JOIN dl d USING (doc_id)
ORDER BY doc_id, dim"""
