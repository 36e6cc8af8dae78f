"""Text-analysis pipelines over a document table (training-data ops):
token counts, term df, corpus stats, quality scoring, language ID,
fingerprints. Each has a DuckDB-oracle mirror in __ray_entry__.oracle_sql
(pinned logic lives in functions/textstats.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.textstats import (
    LANG_MARKERS,
    LANG_PRIORITY,
    STOPWORDS,
    fingerprint,
    lang_id,
    quality_metrics,
)
from ..functions.tokenize import SimpleTokenizer

_TOK = SimpleTokenizer()


def doc_token_counts(ds: ray.data.Dataset, *, text_col: str = "text",
                     id_col: str = "doc_id") -> ray.data.Dataset:
    """(doc_id, n_tokens) via the vectorized Arrow tokenize path."""

    def f(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        _, _, dl = _TOK.tokenize_column(col)
        return pa.table(
            {
                "doc_id": batch.column(id_col).cast(pa.int64()),
                "n_tokens": pa.array(dl, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def term_df(ds: ray.data.Dataset, *, text_col: str = "text",
            id_col: str = "doc_id") -> ray.data.Dataset:
    """(term, df): docs containing each term. Partial aggregation happens
    inside the batch (distinct per doc) before the term groupby."""

    def explode_distinct(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat, parents, _ = _TOK.tokenize_column(col)
        t = pa.table({"term": flat, "row": pa.array(parents, pa.int64())})
        dedup = t.group_by(["row", "term"], use_threads=False).aggregate([])
        return pa.table({"term": dedup.column("term")})

    exploded = ds.map_batches(explode_distinct, batch_format="pyarrow", zero_copy_batch=True)
    from ..stages.exchange import partitioned_aggregate

    return partitioned_aggregate(
        exploded, ["term"], [("term", "count")], rename={"term_count": "df"}
    )


def corpus_stats(ds: ray.data.Dataset, *, text_col: str = "text",
                 id_col: str = "doc_id") -> pa.Table:
    """One row: (n_docs, total_len, avgdl) — partial sums per batch, tiny
    final reduce on the driver."""
    counts = doc_token_counts(ds, text_col=text_col, id_col=id_col)
    agg = counts.aggregate(
        ray.data.aggregate.Count(), ray.data.aggregate.Sum("n_tokens")
    )
    n = int(agg["count()"])
    total = int(agg["sum(n_tokens)"])
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "total_len": pa.array([total], pa.int64()),
            "avgdl": pa.array([total / n if n else 0.0], pa.float64()),
        }
    )


def quality_scores(ds: ray.data.Dataset, *, text_col: str = "text",
                   id_col: str = "doc_id") -> ray.data.Dataset:
    """(doc_id, n_tokens, stopword_ratio, mean_token_len), ratios rounded
    to 6 dp (same rounding as the SQL oracle)."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        ms = [quality_metrics(t or "") for t in batch.column(text_col).to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array([m["n_tokens"] for m in ms], pa.int64()),
                "stopword_ratio": pa.array(
                    [round(m["stopword_ratio"], 6) for m in ms], pa.float64()
                ),
                "mean_token_len": pa.array(
                    [round(m["mean_token_len"], 6) for m in ms], pa.float64()
                ),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def language_id(ds: ray.data.Dataset, *, text_col: str = "text",
                id_col: str = "doc_id") -> ray.data.Dataset:
    """(doc_id, pred_lang) marker-word heuristic (pinned tie-break)."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        preds = [lang_id(t or "") for t in batch.column(text_col).to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "pred_lang": pa.array(preds, pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def doc_fingerprints(ds: ray.data.Dataset, *, text_col: str = "text",
                     id_col: str = "doc_id") -> ray.data.Dataset:
    """(doc_id, fingerprint) rolling-hash document fingerprints."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        fps = [fingerprint(t or "") for t in batch.column(text_col).to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "fingerprint": pa.array(np.array(fps, dtype=np.uint64), pa.uint64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
