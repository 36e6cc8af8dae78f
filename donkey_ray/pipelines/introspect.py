"""Index-artifact introspection and dictionary-served operators.

Both operators here answer questions FROM THE INDEX ARTIFACT itself
(never re-reading the corpus), which makes them end-to-end parity
checks of the build pipeline: the driver oracle recomputes the same
numbers from the raw documents table in SQL, so any encode/merge/salt
bug shows up as a mismatch.

- ``index_stats``: one-row corpus summary (n_docs, n_terms,
  n_postings, total_tokens) from a distributed scan of the segment
  files. Per-partition work emits O(1) rows + the (tiny) list of hot
  terms present, so the driver merge is O(partitions + hot terms) —
  never O(vocabulary).
- ``suggest``: autocomplete — top-k dictionary completions of a prefix
  ranked by global df. Served from the sharded lazy dictionary via
  row-group-pruned range scans (stages/score._SegmentShard), the same
  path wildcard queries use.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.codec import varbyte_decode
from ..state import manifest as mf


def index_stats(index_dir: str) -> pa.Table:
    """One row: (n_docs, n_terms, n_postings, total_tokens) computed
    from the segment artifacts.

    n_terms counts DISTINCT terms: a salted hot term has a run in
    several partitions, so per-partition term counts over-count it by
    (runs - 1). Each partition reports which hot terms it holds (the
    hot set is tiny, pinned in the build manifest) and the driver
    subtracts the duplicates — an O(hot) correction, not a vocabulary
    shuffle. n_postings = sum(df) is exact as-is because salted runs
    cover disjoint doc sets; total_tokens = sum of all decoded tfs
    (sum_doc dl by exchange of summation order)."""
    meta = mf.load_meta(index_dir)
    hot = sorted(set(meta.get("hot_terms", ())))
    hot_arr = pa.array(hot, pa.string())
    parts = sorted(int(p) for p in meta["parts_built"])

    def scan(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        out = {"n_terms": [], "n_postings": [], "total_tf": [], "hot_seen": []}
        for part in batch.column("part").to_pylist():
            path = mf.segment_path(index_dir, int(part))
            tbl = pq.read_table(path, columns=["term", "df", "tfs"])
            terms = tbl.column("term")
            dfs = tbl.column("df")
            # all runs' tf streams are varbyte (self-delimiting): one
            # concatenated decode instead of a per-term loop
            bufs = tbl.column("tfs").combine_chunks()
            joined = b"".join(
                (bufs[i].as_py() or b"") for i in range(len(bufs))
            )
            total_tf = (
                int(varbyte_decode(np.frombuffer(joined, np.uint8)).sum())
                if joined
                else 0
            )
            seen = (
                terms.filter(pc.is_in(terms, value_set=hot_arr))
                if len(hot)
                else pa.chunked_array([pa.array([], pa.string())])
            )
            out["n_terms"].append(tbl.num_rows)
            out["n_postings"].append(int(pc.sum(dfs).as_py() or 0))
            out["total_tf"].append(total_tf)
            out["hot_seen"].append(seen.combine_chunks().to_pylist())
        return pa.table(
            {
                "n_terms": pa.array(out["n_terms"], pa.int64()),
                "n_postings": pa.array(out["n_postings"], pa.int64()),
                "total_tf": pa.array(out["total_tf"], pa.int64()),
                "hot_seen": pa.array(out["hot_seen"], pa.list_(pa.string())),
            }
        )

    per_part = (
        ray.data.from_items([{"part": p} for p in parts])
        .map_batches(scan, batch_format="pyarrow", batch_size=1)
    )
    rows = per_part.take_all()  # O(partitions) rows — tiny by design
    n_terms = sum(r["n_terms"] for r in rows)
    n_postings = sum(r["n_postings"] for r in rows)
    total_tokens = sum(r["total_tf"] for r in rows)
    from collections import Counter

    hot_counts: Counter[str] = Counter()
    for r in rows:
        hot_counts.update(r["hot_seen"])
    n_terms -= sum(c - 1 for c in hot_counts.values() if c > 1)
    return pa.table(
        {
            "n_docs": pa.array([int(meta["n_docs"])], pa.int64()),
            "n_terms": pa.array([n_terms], pa.int64()),
            "n_postings": pa.array([n_postings], pa.int64()),
            "total_tokens": pa.array([total_tokens], pa.int64()),
        }
    )


def suggest(
    index_dir: str,
    prefixes: list[tuple[int, str]],
    *,
    k: int = 5,
    max_terms: int = 4096,
) -> pa.Table:
    """Autocomplete: for each (prefix_id, prefix), the top-k dictionary
    completions by (global df desc, term asc), with 1-based srank.

    Runs on the driver over the sharded lazy dictionary: a prefix scan
    touches only row groups whose term-statistics range overlaps the
    prefix interval, and df comes from the dictionary rows (postings
    are never decoded). Prefix workloads are interactive-small; a
    large batched workload would wrap this in score_queries' actor
    pool instead."""
    from ..stages.score import QueryEngine

    eng = QueryEngine(index_dir)
    pids, terms_out, dfs_out, ranks = [], [], [], []
    for pid, prefix in prefixes:
        toks = eng._tok.tokenize(prefix)
        if not toks:
            continue
        terms = eng.expand_prefix(toks[0], max_terms=max_terms)
        scored = sorted(
            ((eng.term_df(t), t) for t in terms), key=lambda x: (-x[0], x[1])
        )
        for r, (df, t) in enumerate(scored[:k], start=1):
            pids.append(int(pid))
            terms_out.append(t)
            dfs_out.append(int(df))
            ranks.append(r)
    return pa.table(
        {
            "prefix_id": pa.array(pids, pa.int64()),
            "term": pa.array(terms_out, pa.string()),
            "df": pa.array(dfs_out, pa.int64()),
            "srank": pa.array(ranks, pa.int32()),
        }
    )


def spell_correct(
    index_dir: str,
    queries: list[tuple[int, str]],
    *,
    k: int = 3,
) -> pa.Table:
    """Did-you-mean: for each (query_id, term), the top-k dictionary
    terms at EXACTLY edit distance 1 (the input itself is never a
    suggestion), ranked by (global df desc, term asc) with 1-based
    srank. Candidates come from the trigram artifact (provably complete
    for max_edit=1, pipelines/fuzzy.py); df from the sharded dictionary
    — postings never decoded. A term that is itself frequent still gets
    suggestions; the CALLER decides when to show them (e.g. only when
    the term's own df is 0)."""
    from ..pipelines.fuzzy import expand_fuzzy
    from ..stages.score import QueryEngine

    eng = QueryEngine(index_dir)
    qids, terms_out, dfs_out, ranks = [], [], [], []
    for qid, term in queries:
        toks = eng._tok.tokenize(term)
        if not toks:
            continue
        cand = [t for t in expand_fuzzy(index_dir, toks[0]) if t != toks[0]]
        scored = sorted(
            ((eng.term_df(t), t) for t in cand), key=lambda x: (-x[0], x[1])
        )
        for r, (df, t) in enumerate(scored[:k], start=1):
            qids.append(int(qid))
            terms_out.append(t)
            dfs_out.append(int(df))
            ranks.append(r)
    return pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "term": pa.array(terms_out, pa.string()),
            "df": pa.array(dfs_out, pa.int64()),
            "srank": pa.array(ranks, pa.int32()),
        }
    )
