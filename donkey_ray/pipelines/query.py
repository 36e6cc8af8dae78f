"""Query serving pipeline (SURVEY.md section 3.2.2).

Queries are a Dataset; scoring is an actor pool (one QueryEngine per
actor, built once in __init__) parallelized OVER QUERIES — each actor can
read any term-partition (shared storage), so a multi-term query never
needs a cross-actor merge. The dictionary is SHARDED AND LAZY
(stages/score._SegmentShard): an actor touches only the row groups of
the partitions its query terms hash to, so per-actor memory is
independent of corpus vocabulary (the 10^12-doc serving path).
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data

from ..stages.score import QueryEngine


class QueryScorerStage:
    """map_batches actor: QUERIES-schema batches -> RESULTS-schema batches.

    ``kind`` selects the engine entry point: "topk" (bag-of-words BM25),
    "and" (conjunctive BM25 via posting-list intersection; any index),
    "prefix" (wildcard: dictionary range-scan expansion, then
    disjunctive BM25 over the matching terms), "phrase" (exact
    positional phrase), or "near" (proximity-filtered conjunctive BM25
    within ``window`` positions of the anchor term; the latter two need
    an index built with positions=True)."""

    def __init__(self, index_dir: str, mode: str = "auto",
                 kind: str = "topk", window: int = 4) -> None:
        self.engine = QueryEngine(index_dir, mode=mode)
        if kind == "phrase":
            self.run = self.engine.phrase_topk
        elif kind == "near":
            eng = self.engine
            self.run = lambda text, k: eng.near_topk(text, k, window=window)
        elif kind == "and":
            self.run = self.engine.and_topk
        elif kind == "prefix":
            self.run = self.engine.prefix_topk
        elif kind == "topk":
            self.run = self.engine.topk
        else:
            raise ValueError(f"unknown query kind: {kind!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for row in batch.to_pylist():
            hits = self.run(row["text"], int(row["k"]))
            for r, (d, s) in enumerate(hits, start=1):
                qids.append(int(row["query_id"]))
                ranks.append(r)
                docs.append(d)
                scores.append(s)
        return pa.table(
            {
                "query_id": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int32()),
                "doc_id": pa.array(docs, pa.int64()),
                "score": pa.array(scores, pa.float64()),
            }
        )


def score_queries(
    index_dir: str,
    queries: ray.data.Dataset | pa.Table,
    *,
    mode: str = "auto",
    kind: str = "topk",
    window: int = 4,
    concurrency=None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    n_queries = queries.num_rows if isinstance(queries, pa.Table) else None
    if isinstance(queries, pa.Table):
        queries = ray.data.from_arrow(queries)
    if concurrency is None:
        # actors sized to the number of query batches (engine init — dict
        # load — is paid per actor; more actors than batches is pure waste)
        cpus = int(ray.cluster_resources().get("CPU", 4))
        n_batches = max(1, (n_queries or 512) // batch_size)
        concurrency = (1, max(1, min(cpus, n_batches, 8)))
    return queries.map_batches(
        QueryScorerStage,
        fn_constructor_kwargs=dict(index_dir=index_dir, mode=mode, kind=kind,
                                   window=window),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def hydrate_results(
    results: ray.data.Dataset | pa.Table, index_dir: str
) -> pa.Table:
    """Join results to the docs table (SURVEY.md B20) — broadcast the tiny
    results side into a lookup against the docs parquet, never a shuffle.
    Returns a pyarrow Table (results are top-k-small by construction)."""
    import os

    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from ..util import dataset_to_table

    res = dataset_to_table(results)
    docs = pads.dataset(os.path.join(index_dir, "docs"))
    wanted = pc.unique(res.column("doc_id"))
    hits = docs.to_table(
        columns=["doc_id", "repo", "path", "lang"],
        filter=pads.field("doc_id").isin(wanted),
    )
    return res.join(hits, keys="doc_id", join_type="left outer")


def snippets(
    results: pa.Table,
    texts: pa.Table,
    query_terms: dict[int, list[str]],
    *,
    before: int = 30,
    width: int = 60,
) -> pa.Table:
    """Search-result previews: for each (query_id, doc_id) hit, a
    ``width``-char window of the doc text starting ``before`` chars
    ahead of the EARLIEST occurrence of any of the query's terms in
    lower(text). Pinned, SQL-mirrorable spec (1-based positions, plain
    substring match): pos = min over terms of strpos(lower(text), term)
    (zero = absent), start = max(1, pos - before), snippet =
    substr(text, start, width). A BM25 hit always contains at least one
    query term as a token, hence as a substring. Result-set operator:
    O(hits) work on top-k-small input."""
    text_by_id = {
        int(i): (t or "")
        for i, t in zip(
            texts.column("doc_id").to_pylist(), texts.column("text").to_pylist()
        )
    }
    qids = results.column("query_id").to_pylist()
    docs = results.column("doc_id").to_pylist()
    out: list[str | None] = []
    for qid, d in zip(qids, docs):
        text = text_by_id.get(int(d), "")
        low = text.lower()
        pos = min(
            (p for t in query_terms.get(int(qid), ()) if (p := low.find(t)) >= 0),
            default=-1,
        )
        if pos < 0:
            out.append(None)
            continue
        start = max(0, pos - before)
        out.append(text[start: start + width])
    return results.append_column("snippet", pa.array(out, pa.string()))


def facet_counts(
    results: ray.data.Dataset | pa.Table,
    index_dir: str,
    facets: tuple[str, ...] = ("lang", "repo"),
) -> pa.Table:
    """Per-query facet counts over a top-k RESULT SET (the search-UI
    sidebar: 'of your 50 hits, 31 are python, 12 are repo X'). Hydrates
    the results against the docs table (broadcast-small lookup, same as
    hydrate_results), then counts per (query_id, facet column, value).
    Results are top-k-small by construction, so the counting itself is a
    single Arrow group_by — this is a RESULT-SET operator, not a corpus
    aggregate (corpus-wide facets are pipelines/analyze.py's job)."""
    hyd = hydrate_results(results, index_dir)
    parts = []
    for col in facets:
        g = (
            hyd.select(["query_id", col])
            .group_by(["query_id", col], use_threads=False)
            .aggregate([([], "count_all")])
        )
        parts.append(
            pa.table(
                {
                    "query_id": g.column("query_id").cast(pa.int64()),
                    "facet": pa.array([col] * g.num_rows, pa.string()),
                    "value": g.column(col).cast(pa.string()),
                    "n": g.column("count_all").cast(pa.int64()),
                }
            )
        )
    return pa.concat_tables(parts)
