"""Naive-Bayes document classifier — the model-based quality/domain
filter of the GPT-3 / CCNet curation recipe, pinned integer spec.

A multinomial Naive Bayes over hashed-unigram buckets is trained on the
even-``doc_id`` half of the corpus (labels: ``lang == target_lang`` vs
rest) and scores the odd-``doc_id`` holdout:

    score(d) = prior + sum over token occurrences of lp[b(t)] - ln[b(t)]

where b(t) is the DSIR bucket hash (sha256 top 8 bytes mod B), lp / ln
are the add-1-smoothed per-class bucket log-likelihoods and ``prior``
the class-log-prior delta, every log quantized to x1e6 BIGINT BEFORE
the per-doc sum (floor(x * 1e6 + 0.5)) so document scores are exact
integer sums — the only float op is one ln per bucket per class,
mirrored operand-for-operand in the DuckDB oracle. ``pred = score > 0``.
Token-less holdout docs are classified by the prior alone.

This is deliberately the same hashed-feature machinery as DSIR
(pipelines/dsir.py) pointed at a different job: DSIR produces soft
importance weights for resampling; this trains a hard train/holdout
classifier with priors, predictions, and a confusion-matrix eval.

Eval honesty: the driver's synthetic tables carry NO text<->lang signal
(every lang draws from one shared vocabulary), so on them the holdout
accuracy sits at the class prior — the oracle still value-matches
exactly; tests/test_classify_sampling.py proves >0.9 holdout accuracy
on a planted two-vocabulary corpus. With B=1024 comparable to the tiny
test corpus's token count, add-1 smoothing also contributes a known
per-token bias ln((1+B/Tn)/(1+B/Tp)) toward the token-richer class; it
decays as 1/T and is irrelevant at production corpus sizes.

Scale shape: ZERO shuffles. Pass 1 reduces each batch to two fixed
B-length class-count vectors plus two scalar doc counts (state size is
a constant, independent of corpus and vocabulary); the driver folds
them in unbounded ints and ships one B-length delta array + one scalar
back in the scoring closure. Pass 2 is a pure per-batch map. The
confusion matrix folds 4-row per-batch partials on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..util import dataset_to_table
from .dsir import DSIR_SCALE, _hex64_mod_expr, _occurrence_buckets

NB_BUCKETS = 1024


def _q_ln(num: np.ndarray | float, den: float) -> np.ndarray:
    """floor(ln(num / den) * 1e6 + 0.5) as int64 — the pinned log
    quantization (same rounding as DSIR's)."""
    x = np.asarray(num, dtype=np.float64) / float(den)
    return np.floor(np.log(x) * DSIR_SCALE + 0.5).astype(np.int64)


def nb_train(
    ds: ray.data.Dataset,
    *,
    target_lang: str = "en",
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    buckets: int = NB_BUCKETS,
) -> dict:
    """Fit the NB model on training rows (``doc_id % 2 == 0``). Returns
    {"delta": int64[B] (lp - ln per bucket), "prior": int, "buckets": B}.
    One streaming pass; each batch emits two B-vectors + two counts."""

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "cp": pa.array([], pa.list_(pa.int64())),
            "cn": pa.array([], pa.list_(pa.int64())),
            "np_": pa.array([], pa.int64()),
            "nn_": pa.array([], pa.int64()),
        })
        if batch.num_rows == 0:
            return empty
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        train = (ids % 2) == 0
        if not train.any():
            return empty
        batch = batch.filter(pa.array(train))
        pos = np.asarray(
            [v == target_lang for v in batch.column(lang_col).to_pylist()],
            dtype=bool)
        bk, parents = _occurrence_buckets(batch, text_col, buckets)
        pm = pos[parents] if len(bk) else np.empty(0, bool)
        cp = np.bincount(bk[pm], minlength=buckets).astype(np.int64)
        cn = np.bincount(bk[~pm], minlength=buckets).astype(np.int64)
        return pa.table({
            "cp": pa.array([cp], pa.list_(pa.int64())),
            "cn": pa.array([cn], pa.list_(pa.int64())),
            "np_": pa.array([int(pos.sum())], pa.int64()),
            "nn_": pa.array([int((~pos).sum())], pa.int64()),
        })

    parts = dataset_to_table(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True))
    cp = np.zeros(buckets, dtype=object)
    cn = np.zeros(buckets, dtype=object)
    for r in parts.column("cp").to_pylist():
        cp += np.asarray(r, dtype=object)
    for r in parts.column("cn").to_pylist():
        cn += np.asarray(r, dtype=object)
    n_pos = sum(parts.column("np_").to_pylist())
    n_neg = sum(parts.column("nn_").to_pylist())
    tp, tn = int(cp.sum()), int(cn.sum())
    lp = _q_ln(cp.astype(np.float64) + 1.0, tp + buckets)
    ln_ = _q_ln(cn.astype(np.float64) + 1.0, tn + buckets)
    prior = int(_q_ln(n_pos + 1.0, n_pos + n_neg + 2)
                - _q_ln(n_neg + 1.0, n_pos + n_neg + 2))
    return {"delta": lp - ln_, "prior": prior, "buckets": buckets,
            "target_lang": target_lang}


def nb_scores(
    ds: ray.data.Dataset,
    model: dict,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> ray.data.Dataset:
    """Score the holdout rows (``doc_id % 2 == 1``) with a trained model:
    (doc_id, score_x1e6, pred, actual) — pred/actual as 0/1 BIGINT.
    Pure per-batch map; model state is O(B) in the task closure."""
    delta = model["delta"]
    prior = model["prior"]
    buckets = model["buckets"]
    target_lang = model["target_lang"]

    def score(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "score_x1e6": pa.array([], pa.int64()),
            "pred": pa.array([], pa.int64()),
            "actual": pa.array([], pa.int64()),
        })
        if batch.num_rows == 0:
            return empty
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        hold = (ids % 2) == 1
        if not hold.any():
            return empty
        batch = batch.filter(pa.array(hold))
        ids = ids[hold]
        sums = np.full(batch.num_rows, prior, dtype=np.int64)
        bk, parents = _occurrence_buckets(batch, text_col, buckets)
        if len(bk):
            np.add.at(sums, parents, delta[bk])
        actual = np.asarray(
            [1 if v == target_lang else 0
             for v in batch.column(lang_col).to_pylist()], dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(ids),
            "score_x1e6": pa.array(sums),
            "pred": pa.array((sums > 0).astype(np.int64)),
            "actual": pa.array(actual),
        })

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def nb_confusion(scores: ray.data.Dataset) -> pa.Table:
    """Holdout confusion matrix (actual, pred, n) from an nb_scores
    stream: per-batch 2x2 partials, 4-integer driver fold."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        a = batch.column("actual").to_numpy(zero_copy_only=False)
        p = batch.column("pred").to_numpy(zero_copy_only=False)
        c = np.bincount(a * 2 + p, minlength=4).astype(np.int64)
        return pa.table({"cell": pa.array(np.arange(4, dtype=np.int64)),
                         "n": pa.array(c)})

    parts = dataset_to_table(
        scores.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True))
    tot = np.zeros(4, dtype=np.int64)
    cells = parts.column("cell").to_numpy(zero_copy_only=False)
    np.add.at(tot, cells, parts.column("n").to_numpy(zero_copy_only=False))
    return pa.table({
        "actual": pa.array([0, 0, 1, 1], pa.int64()),
        "pred": pa.array([0, 1, 0, 1], pa.int64()),
        "n": pa.array(tot),
    })


def _nb_score_ctes(*, target_lang: str, buckets: int, table: str) -> str:
    """Shared oracle CTE chain ending in sc(doc_id, score_x1e6, pred,
    actual) over the holdout. Mirrors the engine operand-for-operand."""
    b = _hex64_mod_expr("term", buckets)
    s = DSIR_SCALE
    return f"""
WITH tok AS MATERIALIZED (
  SELECT doc_id, lang,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM {table}),
bk AS MATERIALIZED (
  SELECT term, {b} AS b FROM (SELECT DISTINCT term FROM tok)),
tb AS MATERIALIZED (
  SELECT tok.doc_id, tok.lang, bk.b FROM tok JOIN bk USING (term)),
nd AS MATERIALIZED (
  SELECT count(*) FILTER (WHERE lang = '{target_lang}') AS n_pos,
         count(*) FILTER (WHERE lang <> '{target_lang}') AS n_neg
  FROM {table} WHERE doc_id % 2 = 0),
tot AS MATERIALIZED (
  SELECT count(*) FILTER (WHERE lang = '{target_lang}') AS tp,
         count(*) FILTER (WHERE lang <> '{target_lang}') AS tn
  FROM tb WHERE doc_id % 2 = 0),
cnt AS MATERIALIZED (
  SELECT b, count(*) FILTER (WHERE lang = '{target_lang}') AS cp,
         count(*) FILTER (WHERE lang <> '{target_lang}') AS cn
  FROM tb WHERE doc_id % 2 = 0 GROUP BY b),
l AS MATERIALIZED (
  SELECT g.b,
         CAST(floor(ln((COALESCE(cnt.cp, 0) + 1.0)
                       / ((SELECT tp FROM tot) + {buckets}.0))
                    * {s} + 0.5) AS BIGINT)
       - CAST(floor(ln((COALESCE(cnt.cn, 0) + 1.0)
                       / ((SELECT tn FROM tot) + {buckets}.0))
                    * {s} + 0.5) AS BIGINT) AS d
  FROM (SELECT unnest(generate_series(0, {buckets - 1})) AS b) g
  LEFT JOIN cnt ON cnt.b = g.b),
pr AS MATERIALIZED (
  SELECT CAST(floor(ln((n_pos + 1.0) / (n_pos + n_neg + 2.0))
                    * {s} + 0.5) AS BIGINT)
       - CAST(floor(ln((n_neg + 1.0) / (n_pos + n_neg + 2.0))
                    * {s} + 0.5) AS BIGINT) AS prior
  FROM nd),
ds AS MATERIALIZED (
  SELECT tb.doc_id, SUM(l.d)::BIGINT AS dsum
  FROM tb JOIN l USING (b) WHERE tb.doc_id % 2 = 1 GROUP BY tb.doc_id),
sc AS MATERIALIZED (
  SELECT d.doc_id,
         ((SELECT prior FROM pr) + COALESCE(ds.dsum, 0))::BIGINT
           AS score_x1e6,
         (((SELECT prior FROM pr) + COALESCE(ds.dsum, 0)) > 0)::BIGINT
           AS pred,
         (d.lang = '{target_lang}')::BIGINT AS actual
  FROM {table} d LEFT JOIN ds USING (doc_id)
  WHERE d.doc_id % 2 = 1)"""


def nb_scores_oracle_sql(
    *, target_lang: str = "en", buckets: int = NB_BUCKETS,
    table: str = "documents",
) -> str:
    return (_nb_score_ctes(target_lang=target_lang, buckets=buckets,
                           table=table)
            + "\nSELECT doc_id, score_x1e6, pred, actual FROM sc"
            + "\nORDER BY doc_id")


def nb_confusion_oracle_sql(
    *, target_lang: str = "en", buckets: int = NB_BUCKETS,
    table: str = "documents",
) -> str:
    return (_nb_score_ctes(target_lang=target_lang, buckets=buckets,
                           table=table)
            + """
SELECT g.actual, g.pred, COALESCE(c.n, 0)::BIGINT AS n
FROM (SELECT a.a AS actual, p.p AS pred
      FROM (VALUES (0::BIGINT), (1::BIGINT)) a(a),
           (VALUES (0::BIGINT), (1::BIGINT)) p(p)) g
LEFT JOIN (SELECT actual, pred, count(*)::BIGINT AS n
           FROM sc GROUP BY actual, pred) c
  ON c.actual = g.actual AND c.pred = g.pred
ORDER BY g.actual, g.pred""")
