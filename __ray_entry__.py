"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in donkey_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from donkey_ray import driver_api as api

_TOKS = "regexp_extract_all(lower(text), '[a-z0-9]+')"

# pinned s-stemmer over a term column named t (functions/tokenize is the
# single source of the rules; Arrow and DuckDB are both RE2)
from donkey_ray.functions.tokenize import fold_sql as _fold_sql  # noqa: E402
from donkey_ray.functions.tokenize import stem_sql as _stem_sql  # noqa: E402
from donkey_ray.functions.tokenize import stop_sql_list as _stop_sql_list  # noqa: E402

_STEM_T = _stem_sql("t")
_FOLD_TEXT = _fold_sql("text")
_STOP_LIST = _stop_sql_list()


def _stop_query_values() -> str:
    from donkey_ray import driver_api as _api

    return ",".join(
        f"({qid},'{text}',{k})" for qid, text, k in _api.PINNED_STOP_QUERIES
    )


def _stem_query_values() -> str:
    return ",".join(
        f"({qid},'{text}',{k})" for qid, text, k in api.PINNED_STEM_QUERIES
    )

# bigram-LM cross-entropy chain (pipelines/lm.py spec) — shared by the
# perplexity oracle and the ccnet_buckets wrapper
_PERPLEXITY_SQL = f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
uni AS (SELECT t.toks[g.i] AS term
        FROM tok t, unnest(generate_series(1, len(t.toks))) AS g(i)),
cnt AS (SELECT term, count(*) AS c FROM uni GROUP BY 1),
vocab AS (SELECT term FROM cnt ORDER BY c DESC, term LIMIT {api.LM_VOCAB_SIZE}),
stream AS (SELECT t.doc_id, g.i,
                  CASE WHEN t.toks[g.i] IN (SELECT term FROM vocab)
                       THEN t.toks[g.i] ELSE '<unk>' END AS w
           FROM tok t, unnest(generate_series(1, len(t.toks))) AS g(i)),
vm AS (SELECT count(*) + 1 AS v FROM vocab),
bg AS (SELECT a.doc_id, a.w AS w1, b.w AS w2
       FROM stream a JOIN stream b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
bc AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
pfx AS (SELECT w1, sum(c) AS cp FROM bc GROUP BY 1)
SELECT g.doc_id,
       count(*)::BIGINT AS n_bigrams,
       CAST(round(-1000.0 * avg(ln((bc.c + 1.0) / (pfx.cp + vm.v))))
            AS BIGINT) AS ce_x1000
FROM bg g JOIN bc ON bc.w1 = g.w1 AND bc.w2 = g.w2
          JOIN pfx ON pfx.w1 = g.w1, vm
GROUP BY 1
"""

# SQL building blocks for the hash-based oracles (sample_docs,
# doc_fingerprints): wrap-around 64-bit multiply and hex->uint64 parse
_M64 = "18446744073709551616::HUGEINT"


def _mul64(a: str, c: str) -> str:
    """(a * c) mod 2^64 via 32-bit limbs — every partial fits HUGEINT."""
    return (
        f"((({a} % 4294967296::HUGEINT) * ({c} % 4294967296) + "
        f"(((({a} // 4294967296::HUGEINT) * ({c} % 4294967296) + "
        f"({a} % 4294967296::HUGEINT) * ({c} // 4294967296)) % 4294967296::HUGEINT) "
        f"* 4294967296::HUGEINT)) % {_M64})"
    )


def _smix(prefix: str, src: str, cols: str, inexpr: str) -> str:
    """CTE stages applying the engine's pinned splitmix64 finalization
    (functions.hashing.splitmix64 / textstats._mix64_np) to ``inexpr``
    — a HUGEINT expression in [0, 2^64) — carrying ``cols`` through.
    The last stage is ``{prefix}5`` with the mixed value in column z
    (UBIGINT). 64-bit multiplies wrap via _mul64 limb products."""
    c = f"{cols}, " if cols else ""
    return f"""
{prefix}0 AS (SELECT {c}((({inexpr}) + 11400714819323198485) % {_M64})::UBIGINT AS z FROM {src}),
{prefix}1 AS (SELECT {c}xor(z, z >> 30)::HUGEINT AS z FROM {prefix}0),
{prefix}2 AS (SELECT {c}{_mul64('z', '13787848793156543929')}::UBIGINT AS z FROM {prefix}1),
{prefix}3 AS (SELECT {c}xor(z, z >> 27)::HUGEINT AS z FROM {prefix}2),
{prefix}4 AS (SELECT {c}{_mul64('z', '10723151780598845931')}::UBIGINT AS z FROM {prefix}3),
{prefix}5 AS (SELECT {c}xor(z, z >> 31) AS z FROM {prefix}4)"""


# FNV-64 prime: the pinned shingle/band polynomial multiplier
_FNV = "1099511628211"

# the engine's epoch-shuffle key input: doc_id XOR splitmix64(EPOCH)
# (the mixed-epoch constant is computed with the engine's own primitive
# so both sides pin the identical chain)
import numpy as _np_mix
from donkey_ray.functions.hashing import splitmix64 as _splitmix64

_EPOCH_MIX = int(_splitmix64(
    _np_mix.asarray([api.EPOCH], dtype=_np_mix.uint64))[0])
_EPOCH_INEXPR = (
    f"xor(doc_id::UBIGINT, {_EPOCH_MIX}::UBIGINT)::HUGEINT")

# shared CTE chain: exact unigram-Jaccard pair graph -> per-node
# component-min label (used by dedup_clusters and cluster_canonical)
_CLUSTER_CTE = """
sh AS (SELECT DISTINCT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS s FROM documents),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
pr AS (SELECT da AS a, db AS b
       FROM inter JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
       WHERE c::DOUBLE / (x.n + y.n - c) >= 0.5),
e AS (SELECT a, b FROM pr UNION SELECT b, a FROM pr),
walk(node, lab) AS (
    SELECT a, a FROM e
    UNION
    SELECT e.b, walk.lab FROM walk JOIN e ON e.a = walk.node
    WHERE walk.lab < e.b
),
lab AS (SELECT node, min(lab) AS cluster_id FROM walk GROUP BY 1)"""

# winnowing fingerprint CTE chain (pipelines/winnow.py pinned spec):
# k=5 token grams hashed as substr(sha256(gram),1,16); over every window
# of w=4 gram positions select the min hash, rightmost on ties
_WINNOW_CTE = f"""
tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        FROM documents),
g AS (SELECT doc_id, (i - 1)::BIGINT AS pos,
             substr(sha256(array_to_string(toks[i:i+4], ' ')), 1, 16) AS h
      FROM tok, unnest(generate_series(1, len(toks) - 4)) AS t(i)
      WHERE len(toks) >= 5),
nn AS (SELECT doc_id, max(pos) AS mx FROM g GROUP BY 1),
wmin AS (SELECT g1.doc_id, g1.pos AS strt, min(g2.h) AS mh
         FROM g g1
         JOIN nn ON nn.doc_id = g1.doc_id AND g1.pos + 3 <= nn.mx
         JOIN g g2 ON g2.doc_id = g1.doc_id
                  AND g2.pos BETWEEN g1.pos AND g1.pos + 3
         GROUP BY 1, 2),
sel AS (SELECT w.doc_id, max(g2.pos) AS pos
        FROM wmin w JOIN g g2 ON g2.doc_id = w.doc_id
                             AND g2.pos BETWEEN w.strt AND w.strt + 3
                             AND g2.h = w.mh
        GROUP BY w.doc_id, w.strt),
fps AS (SELECT DISTINCT s.doc_id, s.pos, g.h AS fingerprint
        FROM sel s JOIN g ON g.doc_id = s.doc_id AND g.pos = s.pos)"""

# first 16 hex chars of sha256(s) -> UBIGINT (big-endian top 8 bytes)
_HEX64 = (
    "list_aggregate(list_transform(range(1,17), "
    "i -> (strpos('0123456789abcdef', substr(sha256(s), i, 1))::UBIGINT - 1) "
    "* (1::UBIGINT << (4*(16-i)))), 'sum')"
)


def entry() -> Any:
    """Flagship: BM25 index build + pinned query serving on sf0.001."""
    return api.flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # inverted-index / BM25 engine (SURVEY.md section 2B)
        "bm25_topk": api.q_bm25_topk,
        "stemmed_topk": api.q_stemmed_topk,
        "stem_term_df": api.q_stem_term_df,
        "stop_topk": api.q_stop_topk,
        "folded_term_df": api.q_folded_term_df,
        "phrase_topk": api.q_phrase_topk,
        "sloppy_topk": api.q_sloppy_topk,
        "near_topk": api.q_near_topk,
        "bm25_topk_and": api.q_bm25_topk_and,
        "bm25_topk_msm": api.q_bm25_topk_msm,
        "collapse_topk": api.q_collapse_topk,
        "decontaminate": api.q_decontaminate,
        "explain_scores": api.q_explain_scores,
        "search_page2": api.q_search_page2,
        "synonym_topk": api.q_synonym_topk,
        "embedding_centroids": api.q_embedding_centroids,
        "orders_customer_full": api.q_orders_customer_full,
        "events_running": api.q_events_running,
        "events_moving": api.q_events_moving,
        "events_delta": api.q_events_delta,
        "events_quantiles_sketch": api.q_events_quantiles_sketch,
        "doclen_percentiles": api.q_doclen_percentiles,
        "filtered_topk": api.q_filtered_topk,
        "sorted_topk": api.q_sorted_topk,
        "threshold_topk": api.q_threshold_topk,
        "events_funnel": api.q_events_funnel,
        "events_pivot": api.q_events_pivot,
        "longest_per_lang": api.q_longest_per_lang,
        "boosted_topk": api.q_boosted_topk,
        "hit_counts": api.q_hit_counts,
        "events_distinct_approx": api.q_events_distinct_approx,
        "perplexity": api.q_perplexity,
        "ccnet_buckets": api.q_ccnet_buckets,
        "value_histogram": api.q_value_histogram,
        "spell_correct": api.q_spell_correct,
        "curate_corpus": api.q_curate_corpus,
        "mix_sample": api.q_mix_sample,
        "pack_shards": api.q_pack_shards,
        "epoch_shuffle": api.q_epoch_shuffle,
        "stratified_split": api.q_stratified_split,
        "grouped_split": api.q_grouped_split,
        "weighted_sample": api.q_weighted_sample,
        "bm25_topk_not": api.q_bm25_topk_not,
        "rerank_cosine": api.q_rerank_cosine,
        "prefix_topk": api.q_prefix_topk,
        "wildcard_topk": api.q_wildcard_topk,
        "fielded_topk": api.q_fielded_topk,
        "bm25_topk_per_lang": api.q_bm25_topk_per_lang,
        "media_pixel_stats": api.q_media_pixel_stats,
        "audio_fingerprints": api.q_audio_fingerprints,
        "fuzzy_topk": api.q_fuzzy_topk,
        "bm25_topk_wand": api.q_bm25_topk_wand,
        "bm25_topk_scatter": api.q_bm25_topk_scatter,
        "bm25_topk_incremental": api.q_bm25_topk_incremental,
        "fuzzy_topk_incremental": api.q_fuzzy_topk_incremental,
        "bm25_topk_hydrated": api.q_bm25_topk_hydrated,
        "facet_counts": api.q_facet_counts,
        "similar_docs": api.q_similar_docs,
        "snippets": api.q_snippets,
        "sample_docs": api.q_sample_docs,
        "events_window": api.q_events_window,
        "events_sliding": api.q_events_sliding,
        "events_sessions": api.q_events_sessions,
        "events_in_sessions": api.q_events_in_sessions,
        "lineitem_rollup": api.q_lineitem_rollup,
        "lineitem_cube": api.q_lineitem_cube,
        "events_asof_error": api.q_events_asof_error,
        "events_quantiles": api.q_events_quantiles,
        "doclen_quantiles": api.q_doclen_quantiles,
        "events_distinct_users": api.q_events_distinct_users,
        "events_retention": api.q_events_retention,
        "events_anomalies": api.q_events_anomalies,
        "longest_docs": api.q_longest_docs,
        "top_terms_per_lang": api.q_top_terms_per_lang,
        "term_df": api.q_term_df,
        "doc_token_counts": api.q_doc_token_counts,
        "corpus_stats": api.q_corpus_stats,
        "top_terms": api.q_top_terms,
        "top_bigrams": api.q_top_bigrams,
        "heavy_hitters": api.q_heavy_hitters,
        "cooccurrence": api.q_cooccurrence,
        "regex_search": api.q_regex_search,
        "substring_search": api.q_substring_search,
        "grep_indexed": api.q_grep_indexed,
        "index_stats": api.q_index_stats,
        "suggest": api.q_suggest,
        "stratified_sample": api.q_stratified_sample,
        "content_sha256": api.q_content_sha256,
        "filter_project": api.q_filter_project,
        # training-data ops: dedup family
        "exact_dedup": api.q_exact_dedup,
        "ngram_jaccard": api.q_ngram_jaccard,
        "ngram_jaccard_delta": api.q_ngram_jaccard_delta,
        "dedup_clusters": api.q_dedup_clusters,
        "cluster_canonical": api.q_cluster_canonical,
        "dedup_survivors": api.q_dedup_survivors,
        "pagerank": api.q_pagerank,
        "dedup_triangles": api.q_dedup_triangles,
        "dedup_degree": api.q_dedup_degree,
        "corpus_report": api.q_corpus_report,
        "events_validate": api.q_events_validate,
        "minhash_neardup": api.q_minhash_neardup,
        "minhash_neardup_delta": api.q_minhash_neardup_delta,
        "simhash_fingerprints": api.q_simhash_fingerprints,
        "simhash_neardup": api.q_simhash_neardup,
        "simhash_neardup_delta": api.q_simhash_neardup_delta,
        # similarity search over embeddings
        "ann_topk": api.q_ann_topk,
        "ann_ivf_topk": api.q_ann_ivf_topk,
        "ann_sharded_topk": api.q_ann_sharded_topk,
        "ann_graph_topk": api.q_ann_graph_topk,
        "graph_topk_recall": api.q_graph_topk_recall,
        "object_search": api.q_object_search,
        "embedding_neardup": api.q_embedding_neardup,
        "embedding_clusters": api.q_embedding_clusters,
        "knn_label_eval": api.q_knn_label_eval,
        "pca_component": api.q_pca_component,
        "pca_residuals": api.q_pca_residuals,
        "kmeans_clusters": api.q_kmeans_clusters,
        "semdedup": api.q_semdedup,
        "pq_codes": api.q_pq_codes,
        "pq_search": api.q_pq_search,
        "ivfpq_topk": api.q_ivfpq_topk,
        "kmeans_centroids": api.q_kmeans_centroids,
        "sif_embeddings": api.q_sif_embeddings,
        "dsir_weights": api.q_dsir_weights,
        "nb_scores": api.q_nb_scores,
        "nb_confusion": api.q_nb_confusion,
        "jl_project": api.q_jl_project,
        "token_entropy": api.q_token_entropy,
        "bpe_merges": api.q_bpe_merges,
        "bpe_encode": api.q_bpe_encode,
        "prf_topk": api.q_prf_topk,
        "bool_topk": api.q_bool_topk,
        "bm25f_topk": api.q_bm25f_topk,
        "search_eval": api.q_search_eval,
        "mmr_topk": api.q_mmr_topk,
        "passage_topk": api.q_passage_topk,
        "pruned_topk": api.q_pruned_topk,
        "tiered_topk": api.q_tiered_topk,
        # text analysis
        "quality_scores": api.q_quality_scores,
        "compressibility": api.q_compressibility,
        "term_counts_cms": api.q_term_counts_cms,
        "repetition_scores": api.q_repetition_scores,
        "dup_spans": api.q_dup_spans,
        "remove_dup_spans": api.q_remove_dup_spans,
        "tfidf_keywords": api.q_tfidf_keywords,
        "pmi_collocations": api.q_pmi_collocations,
        "winnow_fingerprints": api.q_winnow_fingerprints,
        "winnow_matches": api.q_winnow_matches,
        "chunk_docs": api.q_chunk_docs,
        "dedup_lines": api.q_dedup_lines,
        "dedup_lines_global": api.q_dedup_lines_global,
        "hybrid_topk": api.q_hybrid_topk,
        "redact_pii": api.q_redact_pii,
        "quality_filter": api.q_quality_filter,
        "blocklist_filter": api.q_blocklist_filter,
        "export_clean": api.q_export_clean,
        "lang_id": api.q_lang_id,
        "doc_fingerprints": api.q_doc_fingerprints,
        "bpe_token_counts": api.q_bpe_token_counts,
        # generic columnar aggregation + distributed joins
        "lineitem_agg": api.q_lineitem_agg,
        "orders_customer_join": api.q_orders_customer_join,
        "tpch_q3": api.q_tpch_q3,
        "tpch_q5": api.q_tpch_q5,
        "tpch_q10": api.q_tpch_q10,
        "orders_semi_building": api.q_orders_semi_building,
        "orders_semi_bloom": api.q_orders_semi_bloom,
        "orders_anti_building": api.q_orders_anti_building,
        "orders_customer_join_skew": api.q_orders_customer_join_skew,
        "orders_customer_join_auto": api.q_orders_customer_join_auto,
    }


def oracle_sql() -> dict[str, str]:
    # NOTE: column names and float rounding mirror donkey_ray.driver_api
    # exactly (driver hash-compares values after sorting columns by name).
    sqls = _oracle_sqls()
    # WAND-forced and federated-incremental variants must produce results
    # identical to the plain engine -> same oracle
    sqls["bm25_topk_wand"] = sqls["bm25_topk"]
    # the distributed scatter-gather path must be rank/score-identical
    # to the actor-pool engine -> same oracle
    sqls["bm25_topk_scatter"] = sqls["bm25_topk"]
    sqls["bm25_topk_incremental"] = sqls["bm25_topk"]
    # federated fuzzy (per-member trigram artifacts) must equal
    # single-index fuzzy -> same oracle
    sqls["fuzzy_topk_incremental"] = sqls["fuzzy_topk"]
    # the IVF index at nprobe=n_lists must be brute-force-identical
    sqls["ann_ivf_topk"] = sqls["ann_topk"]
    # sharded graph serving: disjoint EXACT per-shard graphs merged ->
    # globally exact, so it shares the brute-force oracle too
    sqls["ann_sharded_topk"] = sqls["ann_topk"]
    # approximate beam search over the distributed NN-descent graph:
    # the engine emits recall_ok = (|beam topk INTERSECT exact topk|/k
    # >= 0.9) per pinned query; the oracle pins the all-ones assertion
    # table, so a recall regression breaks the driver hash
    sqls["graph_topk_recall"] = (
        "SELECT unnest(generate_series(0, 4))::BIGINT AS query_id, "
        "1::BIGINT AS recall_ok"
    )
    return sqls


def _phrase_sql() -> str:
    """Oracle for phrase_topk, generated from api.PINNED_PHRASES: exact
    positional phrase matching via zipped unnest (term, position) rows and
    an INTERSECT chain (slot i matches term_i at p - i), which counts
    OVERLAPPING occurrences — string replace() tricks would not."""
    blocks, unions = [], []
    for qid, text, k in api.PINNED_PHRASES:
        words = text.split()
        chain = [f"SELECT doc_id, p FROM pos WHERE term='{words[0]}'"]
        chain += [
            f"  INTERSECT SELECT doc_id, p-{i} FROM pos WHERE term='{w}'"
            for i, w in enumerate(words[1:], 1)
        ]
        blocks.append(
            f"starts_{qid} AS (" + "\n".join(chain) + "),\n"
            f"m_{qid} AS (SELECT doc_id, count(*)::DOUBLE AS tf "
            f"FROM starts_{qid} GROUP BY 1),\n"
            f"sc_{qid} AS (SELECT {qid}::BIGINT AS query_id, {k} AS k, "
            "m.doc_id,\n"
            "  ln((s.n_docs - d.df + 0.5)/(d.df + 0.5) + 1) * "
            "m.tf*(1.2+1)/(m.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) "
            "AS score\n"
            f"  FROM m_{qid} m CROSS JOIN "
            f"(SELECT count(*)::DOUBLE AS df FROM m_{qid}) d\n"
            "  JOIN dl ON dl.doc_id = m.doc_id CROSS JOIN stats s)"
        )
        unions.append(f"SELECT * FROM sc_{qid}")
    return (
        f"WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),\n"
        "dl AS (SELECT doc_id, len(toks) AS dl FROM tok),\n"
        "stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),\n"
        "pos AS (SELECT doc_id, unnest(toks) AS term, "
        "unnest(range(len(toks))) AS p FROM tok),\n"
        + ",\n".join(blocks) + ",\n"
        "all_sc AS (" + " UNION ALL ".join(unions) + "),\n"
        "ranked AS (SELECT query_id, k, doc_id, score,\n"
        "                  row_number() OVER (PARTITION BY query_id\n"
        "                                     ORDER BY score DESC, doc_id ASC) AS rank\n"
        "           FROM all_sc)\n"
        "SELECT query_id, rank::INT AS rank, doc_id, round(score, 6) AS score\n"
        "FROM ranked WHERE rank <= k\n"
    )


def _sloppy_sql() -> str:
    """Oracle for sloppy_topk, generated from api.PINNED_SLOPPY: each
    adjacent word pair contributes power(2, -gap) per (p, q = p+1+gap)
    position pair with gap <= SLOPPY_SLOP — dyadic weights, so the
    weighted frequency is exact float64 on both engines — then the
    phrase-as-pseudo-term scoring shell (df = docs with tfw > 0). Docs
    must contain EVERY distinct query term (the engine's candidate
    intersection — Lucene's all-terms-present requirement), hence the
    INTERSECT chain filter."""
    s = api.SLOPPY_SLOP
    blocks, unions = [], []
    for qid, text, k in api.PINNED_SLOPPY:
        words = text.split()
        pair_sqls = [
            ("SELECT a.doc_id, power(2.0, -(b.p - a.p - 1)) AS w\n"
             "    FROM pos a JOIN pos b ON b.doc_id = a.doc_id\n"
             f"    WHERE a.term='{wa}' AND b.term='{wb}' "
             f"AND b.p - a.p - 1 BETWEEN 0 AND {s}")
            for wa, wb in zip(words, words[1:])
        ]
        cand = "\n  INTERSECT ".join(
            f"SELECT DISTINCT doc_id FROM pos WHERE term='{w}'"
            for w in dict.fromkeys(words))
        blocks.append(
            f"cand_{qid} AS (" + cand + "),\n"
            f"pw_{qid} AS (" + "\n  UNION ALL ".join(pair_sqls) + "),\n"
            f"m_{qid} AS (SELECT pw.doc_id, sum(w)::DOUBLE AS tf "
            f"FROM pw_{qid} pw JOIN cand_{qid} c ON c.doc_id = pw.doc_id "
            "GROUP BY 1),\n"
            f"sc_{qid} AS (SELECT {qid}::BIGINT AS query_id, {k} AS k, "
            "m.doc_id,\n"
            "  ln((s.n_docs - d.df + 0.5)/(d.df + 0.5) + 1) * "
            "m.tf*(1.2+1)/(m.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) "
            "AS score\n"
            f"  FROM m_{qid} m CROSS JOIN "
            f"(SELECT count(*)::DOUBLE AS df FROM m_{qid}) d\n"
            "  JOIN dl ON dl.doc_id = m.doc_id CROSS JOIN stats s)"
        )
        unions.append(f"SELECT * FROM sc_{qid}")
    return (
        f"WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),\n"
        "dl AS (SELECT doc_id, len(toks) AS dl FROM tok),\n"
        "stats AS (SELECT count(*)::DOUBLE AS n_docs, "
        "avg(dl)::DOUBLE AS avgdl FROM dl),\n"
        "pos AS (SELECT doc_id, unnest(toks) AS term, "
        "unnest(range(len(toks))) AS p FROM tok),\n"
        + ",\n".join(blocks) + ",\n"
        "all_sc AS (" + " UNION ALL ".join(unions) + "),\n"
        "ranked AS (SELECT query_id, k, doc_id, score,\n"
        "                  row_number() OVER (PARTITION BY query_id\n"
        "                                     ORDER BY score DESC, "
        "doc_id ASC) AS rank\n"
        "           FROM all_sc)\n"
        "SELECT query_id, rank::INT AS rank, doc_id, "
        "round(score, 6) AS score\n"
        "FROM ranked WHERE rank <= k\n"
    )


def _near_sql() -> str:
    """Oracle for near_topk, generated from api.PINNED_NEAR: a doc matches
    iff some position p of the FIRST distinct query term (the anchor) has,
    for EVERY other distinct term, an occurrence q with |q - p| <
    NEAR_WINDOW (correlated EXISTS per non-anchor term); matches score as
    the ordinary summed BM25 of the distinct terms."""
    w = api.NEAR_WINDOW
    blocks, unions = [], []
    for qid, text, k in api.PINNED_NEAR:
        terms = list(dict.fromkeys(text.split()))
        exists = "".join(
            f"\n    AND EXISTS (SELECT 1 FROM pos b WHERE b.doc_id = a.doc_id"
            f" AND b.term='{t}' AND abs(b.p - a.p) < {w})"
            for t in terms[1:]
        )
        in_list = ", ".join(f"'{t}'" for t in terms)
        blocks.append(
            f"m_{qid} AS (SELECT DISTINCT a.doc_id FROM pos a "
            f"WHERE a.term='{terms[0]}'{exists}),\n"
            f"sc_{qid} AS (SELECT {qid}::BIGINT AS query_id, {k} AS k, "
            "m.doc_id,\n"
            "  sum( ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) * "
            "tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) "
            "AS score\n"
            f"  FROM m_{qid} m JOIN tf ON tf.doc_id = m.doc_id "
            f"AND tf.term IN ({in_list})\n"
            "  JOIN df ON df.term = tf.term JOIN dl ON dl.doc_id = m.doc_id "
            "CROSS JOIN stats s\n"
            "  GROUP BY 1, 2, 3)"
        )
        unions.append(f"SELECT * FROM sc_{qid}")
    return (
        f"WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),\n"
        "dl AS (SELECT doc_id, len(toks) AS dl FROM tok),\n"
        "stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),\n"
        "pos AS (SELECT doc_id, unnest(toks) AS term, "
        "unnest(range(len(toks))) AS p FROM tok),\n"
        "tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM pos GROUP BY 1, 2),\n"
        "df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),\n"
        + ",\n".join(blocks) + ",\n"
        "all_sc AS (" + " UNION ALL ".join(unions) + "),\n"
        "ranked AS (SELECT query_id, k, doc_id, score,\n"
        "                  row_number() OVER (PARTITION BY query_id\n"
        "                                     ORDER BY score DESC, doc_id ASC) AS rank\n"
        "           FROM all_sc)\n"
        "SELECT query_id, rank::INT AS rank, doc_id, round(score, 6) AS score\n"
        "FROM ranked WHERE rank <= k\n"
    )


def _pca_sql() -> str:
    """Distributed-PCA oracle: the identical pinned integer power
    iteration unrolled in DuckDB CTEs (pipelines/ann.pca_oracle_sql)."""
    from donkey_ray.pipelines.ann import pca_oracle_sql

    return pca_oracle_sql()


def _pca_residuals_sql() -> str:
    """Top-component-removal oracle: the PCA CTE chain + the mirrored
    float-assembly projection removal (pipelines/ann)."""
    from donkey_ray.pipelines.ann import pca_residuals_oracle_sql

    return pca_residuals_oracle_sql()


def _sif_sql() -> str:
    """SIF-embedding oracle: identical tokenization, pinned rational
    weights, sha256 sign vectors, floor division (pipelines/sif.py)."""
    from donkey_ray.pipelines.sif import sif_oracle_sql

    return sif_oracle_sql()


def _dsir_sql() -> str:
    """DSIR oracle: identical bucket hash + quantized log-likelihoods
    (pipelines/dsir.dsir_oracle_sql)."""
    from donkey_ray.pipelines.dsir import dsir_oracle_sql

    return dsir_oracle_sql()


def _jl_project_sql() -> str:
    """JL projection oracle: identical quantization + sha256 signs
    (pipelines/project.jl_project_oracle_sql)."""
    from donkey_ray.pipelines.project import jl_project_oracle_sql

    return jl_project_oracle_sql()


def _token_entropy_sql() -> str:
    """Token-entropy oracle: per-term quantized contributions, exact
    integer fold (pipelines/analyze.token_entropy_oracle_sql)."""
    from donkey_ray.pipelines.analyze import token_entropy_oracle_sql

    return token_entropy_oracle_sql()


def _bpe_merges_sql() -> str:
    """BPE training oracle: the pinned spec unrolled round-by-round in
    MATERIALIZED CTEs (pipelines/bpe.bpe_merges_oracle_sql)."""
    from donkey_ray.pipelines.bpe import bpe_merges_oracle_sql

    return bpe_merges_oracle_sql(api.BPE_NUM_MERGES)


def _bpe_encode_sql() -> str:
    """BPE encode oracle: per-unique-word symbol counts after the full
    merge chain, joined back onto each doc's word stream."""
    from donkey_ray.pipelines.bpe import bpe_encode_oracle_sql

    return bpe_encode_oracle_sql(api.BPE_NUM_MERGES)


def _nb_scores_sql() -> str:
    """NB classifier oracle: identical bucket hash, class-split counts,
    quantized per-class log-likelihoods + prior (pipelines/classify)."""
    from donkey_ray.pipelines.classify import nb_scores_oracle_sql

    return nb_scores_oracle_sql()


def _nb_confusion_sql() -> str:
    """NB holdout confusion-matrix oracle (pipelines/classify)."""
    from donkey_ray.pipelines.classify import nb_confusion_oracle_sql

    return nb_confusion_oracle_sql()


def _kmeans_clusters_sql() -> str:
    """k-means oracle: the pinned integer Lloyd iteration unrolled in
    DuckDB CTEs (pipelines/kmeans.kmeans_clusters_oracle_sql)."""
    from donkey_ray.pipelines.kmeans import kmeans_clusters_oracle_sql

    return kmeans_clusters_oracle_sql()


def _semdedup_sql() -> str:
    """SemDeDup oracle: k-means chain + within-cluster smaller-id cosine
    anti-join (pipelines/kmeans.semdedup_oracle_sql)."""
    from donkey_ray.driver_api import NEARDUP_COS_THRESHOLD
    from donkey_ray.pipelines.kmeans import semdedup_oracle_sql

    return semdedup_oracle_sql(NEARDUP_COS_THRESHOLD)


def _mmr_sql() -> str:
    """MMR oracle: BM25 candidate CTE + pair-cosine CTE + the greedy
    selection unrolled k rounds (pipelines/query.mmr_oracle_sql)."""
    from donkey_ray.driver_api import (MMR_C, MMR_K, MMR_LAM,
                                       PINNED_QUERIES)
    from donkey_ray.pipelines.query import mmr_oracle_sql

    values = ",".join(f"({q},'{t}')" for q, t, _ in PINNED_QUERIES)
    return mmr_oracle_sql(queries_values=values, toks_expr=_TOKS,
                          c=MMR_C, k=MMR_K, lam=MMR_LAM)


def _pq_codes_sql() -> str:
    """PQ codes oracle: per-subspace pinned k-means chains unrolled in
    DuckDB CTEs (pipelines/pq.pq_codes_oracle_sql); dim read from the
    sf0.01 embeddings table shape (64)."""
    from donkey_ray.pipelines.pq import pq_codes_oracle_sql

    return pq_codes_oracle_sql(dim=64)


def _pq_search_sql() -> str:
    """PQ ADC search oracle over the pinned ANN query ids
    (pipelines/pq.pq_search_oracle_sql)."""
    from donkey_ray.driver_api import ANN_K, ANN_QUERY_IDS
    from donkey_ray.pipelines.pq import pq_search_oracle_sql

    return pq_search_oracle_sql(dim=64, query_ids=ANN_QUERY_IDS, topk=ANN_K)


def _ivfpq_topk_sql() -> str:
    """IVFADC oracle over the pinned ANN query ids: coarse k-means chain
    + residual-PQ chains + integer probe selection + probed ADC
    (pipelines/ivfpq.ivfpq_topk_oracle_sql)."""
    from donkey_ray.driver_api import ANN_K, ANN_QUERY_IDS
    from donkey_ray.pipelines.ivfpq import ivfpq_topk_oracle_sql

    return ivfpq_topk_oracle_sql(dim=64, query_ids=ANN_QUERY_IDS, topk=ANN_K)


def _kmeans_centroids_sql() -> str:
    """k-means centroid-table oracle (pipelines/kmeans)."""
    from donkey_ray.pipelines.kmeans import kmeans_centroids_oracle_sql

    return kmeans_centroids_oracle_sql()


def _pagerank_sql() -> str:
    """PageRank oracle: the unrolled integer-exact power iteration
    (pipelines/graph.pagerank_oracle_sql) over the same near-dup pair
    graph as ngram_jaccard/dedup_clusters."""
    from donkey_ray.pipelines.graph import pagerank_oracle_sql

    prelude = [
        f"pg_sh AS (SELECT DISTINCT doc_id, unnest({_TOKS}) AS s FROM documents)",
        "pg_sz AS (SELECT doc_id, count(*) AS n FROM pg_sh GROUP BY 1)",
        """pg_inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
          FROM pg_sh a JOIN pg_sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2)""",
    ]
    edge_cte = """SELECT da, db
FROM pg_inter JOIN pg_sz x ON x.doc_id = da JOIN pg_sz y ON y.doc_id = db
WHERE c::DOUBLE / (x.n + y.n - c) >= 0.95"""
    return pagerank_oracle_sql(edge_cte, prelude=prelude)



def _cms_sql() -> str:
    """DuckDB mirror of the count-min sketch (functions/sketch.py):
    identical sha256-top64 keys, splitmix64 bucket hashing (HUGEINT limb
    chain), same depth/width — the oracle computes the SAME sketch and
    the SAME min-over-depth estimates."""
    from donkey_ray.driver_api import CMS_QUERY_TERMS
    from donkey_ray.functions.sketch import CMS_SEEDS, CMS_WIDTH

    key = ("list_aggregate(list_transform(range(1,17), i -> "
           "(strpos('0123456789abcdef', substr(sha256(s), i, 1))::UBIGINT - 1)"
           " * (1::UBIGINT << (4*(16-i)))), 'sum')::UBIGINT")

    def chain(pfx: str, carry: str) -> list[str]:
        return [
            f"{pfx}1 AS (SELECT {carry}, xor(z, z >> 30)::HUGEINT AS z FROM {pfx}0)",
            f"{pfx}2 AS (SELECT {carry}, {_mul64('z', '13787848793156543929')}::UBIGINT AS z FROM {pfx}1)",
            f"{pfx}3 AS (SELECT {carry}, xor(z, z >> 27)::HUGEINT AS z FROM {pfx}2)",
            f"{pfx}4 AS (SELECT {carry}, {_mul64('z', '10723151780598845931')}::UBIGINT AS z FROM {pfx}3)",
            f"{pfx}5 AS (SELECT {carry}, xor(z, z >> 31) AS z FROM {pfx}4)",
        ]

    seeds = ", ".join(f"({d}, {s}::UBIGINT)" for d, s in enumerate(CMS_SEEDS))
    terms = ", ".join(f"('{t}')" for t in CMS_QUERY_TERMS)
    ctes = [
        f"tok AS (SELECT unnest({_TOKS}) AS s FROM documents)",
        f"ck AS (SELECT {key} AS k FROM tok)",
        f"sd(d, seed) AS (VALUES {seeds})",
        ("c0 AS (SELECT sd.d, ((xor(ck.k, sd.seed)::HUGEINT + "
         f"11400714819323198485) % {_M64})::UBIGINT AS z "
         "FROM ck CROSS JOIN sd)"),
        *chain("c", "d"),
        f"cb AS (SELECT d, z % {CMS_WIDTH} AS b, count(*) AS cnt FROM c5 GROUP BY 1, 2)",
        f"qt(s) AS (VALUES {terms})",
        f"qk AS (SELECT s AS term, {key} AS k FROM qt)",
        ("q0 AS (SELECT qk.term, sd.d, ((xor(qk.k, sd.seed)::HUGEINT + "
         f"11400714819323198485) % {_M64})::UBIGINT AS z "
         "FROM qk CROSS JOIN sd)"),
        *chain("q", "term, d"),
        f"qb AS (SELECT term, d, z % {CMS_WIDTH} AS b FROM q5)",
    ]
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT q.term, min(COALESCE(cb.cnt, 0))::BIGINT AS est_count\n"
          "FROM qb q LEFT JOIN cb ON cb.d = q.d AND cb.b = q.b GROUP BY 1"
    )


def _oracle_sqls() -> dict[str, str]:
    return {
        "pagerank": _pagerank_sql(),
        "pca_component": _pca_sql(),
        "pca_residuals": _pca_residuals_sql(),
        "kmeans_clusters": _kmeans_clusters_sql(),
        "semdedup": _semdedup_sql(),
        "pq_codes": _pq_codes_sql(),
        "mmr_topk": _mmr_sql(),
        "pq_search": _pq_search_sql(),
        "ivfpq_topk": _ivfpq_topk_sql(),
        "kmeans_centroids": _kmeans_centroids_sql(),
        "sif_embeddings": _sif_sql(),
        "dsir_weights": _dsir_sql(),
        "nb_scores": _nb_scores_sql(),
        "nb_confusion": _nb_confusion_sql(),
        "jl_project": _jl_project_sql(),
        "token_entropy": _token_entropy_sql(),
        "bpe_merges": _bpe_merges_sql(),
        "bpe_encode": _bpe_encode_sql(),
        "term_counts_cms": _cms_sql(),
        "phrase_topk": _phrase_sql(),
        "near_topk": _near_sql(),
        "sloppy_topk": _sloppy_sql(),
        "bm25_topk": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
q(query_id, text, k) AS (VALUES (0,'table',10),(1,'spark merge',10),
                                (2,'window sort key',10),(3,'zzzabsent',10),
                                (4,'value value',10)),
qt AS (SELECT DISTINCT query_id, k,
              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM q),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
scores AS (
  SELECT qt.query_id, qt.k, tf.doc_id,
    sum( ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) *
         tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1,2,3),
ranked AS (SELECT query_id, k, doc_id, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM scores)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, doc_id,
       round(score, 6) AS score
FROM ranked WHERE rank <= k
""",
        # s-stemmer analyzer: same BM25 chain with the pinned stem rules
        # (functions/tokenize.stem_sql — identical RE2 passes both sides)
        # applied to document terms AND query terms before tf/df
        "stemmed_topk": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
q(query_id, text, k) AS (VALUES {_stem_query_values()}),
qt AS (SELECT DISTINCT query_id, k, {_STEM_T} AS term
       FROM (SELECT query_id, k,
                    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
             FROM q)),
terms AS (SELECT doc_id, {_STEM_T} AS term
          FROM (SELECT doc_id, unnest(toks) AS t FROM tok)),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
scores AS (
  SELECT qt.query_id, qt.k, tf.doc_id,
    sum( ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) *
         tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1,2,3),
ranked AS (SELECT query_id, k, doc_id, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM scores)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, doc_id,
       round(score, 6) AS score
FROM ranked WHERE rank <= k
""",
        "stem_term_df": f"""
SELECT term, count(*)::BIGINT AS df
FROM (SELECT DISTINCT doc_id, {_STEM_T} AS term
      FROM (SELECT doc_id, unnest({_TOKS}) AS t FROM documents))
GROUP BY term
""",
        # stopword analyzer: pinned closed-class words dropped on BOTH
        # sides before dl / tf / df, so stats see content tokens only
        "stop_topk": f"""
WITH tok AS (SELECT doc_id,
                    list_filter({_TOKS},
                                t -> NOT list_contains({_STOP_LIST}, t))
                        AS toks
             FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
q(query_id, text, k) AS (VALUES {_stop_query_values()}),
qt AS (SELECT DISTINCT query_id, k, t AS term
       FROM (SELECT query_id, k,
                    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
             FROM q)
       WHERE NOT list_contains({_STOP_LIST}, t)),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
scores AS (
  SELECT qt.query_id, qt.k, tf.doc_id,
    sum( ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) *
         tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1,2,3),
ranked AS (SELECT query_id, k, doc_id, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM scores)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, doc_id,
       round(score, 6) AS score
FROM ranked WHERE rank <= k
""",
        # accent-fold analyzer: tokenize over the pinned-folded text
        # (functions/tokenize.fold_sql — one translate + one replace)
        "folded_term_df": f"""
SELECT term, count(*)::BIGINT AS df
FROM (SELECT DISTINCT doc_id,
             unnest(regexp_extract_all({_FOLD_TEXT}, '[a-z0-9]+')) AS term
      FROM documents)
GROUP BY term
""",
        # result previews: 60-char window from max(1, pos-30), pos = the
        # earliest 1-based strpos of any query term in lower(text)
        "snippets": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
q(query_id, text, k) AS (VALUES (0,'table',10),(1,'spark merge',10),
                                (2,'window sort key',10),(3,'zzzabsent',10),
                                (4,'value value',10)),
qt AS (SELECT DISTINCT query_id, k,
              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM q),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
scores AS (
  SELECT qt.query_id, qt.k, tf.doc_id,
    sum( ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) *
         tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1,2,3),
ranked AS (SELECT query_id, k, doc_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM scores),
hitpos AS (
  SELECT r.query_id, r.rank, r.doc_id, d.text,
         min(CASE WHEN strpos(lower(d.text), qt.term) > 0
                  THEN strpos(lower(d.text), qt.term) END) AS pos
  FROM ranked r
  JOIN documents d ON d.doc_id = r.doc_id
  JOIN qt ON qt.query_id = r.query_id
  WHERE r.rank <= r.k
  GROUP BY 1, 2, 3, 4)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, doc_id,
       CASE WHEN pos IS NOT NULL
            THEN substr(text, greatest(1, pos - 30), 60) END AS snippet
FROM hitpos
""",
        # result-set facets: top-50 per query, counted by lang and source
        "facet_counts": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
q(query_id, text, k) AS (VALUES (0,'table',50),(1,'spark merge',50),
                                (2,'window sort key',50),(3,'zzzabsent',50),
                                (4,'value value',50)),
qt AS (SELECT DISTINCT query_id, k,
              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM q),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
scores AS (
  SELECT qt.query_id, qt.k, tf.doc_id,
    sum( ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) *
         tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1,2,3),
ranked AS (SELECT query_id, k, doc_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM scores),
hits AS (SELECT r.query_id, d.lang, d.source
         FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
         WHERE r.rank <= r.k)
SELECT query_id, 'lang' AS facet, lang AS value, count(*)::BIGINT AS n
FROM hits GROUP BY 1, 3
UNION ALL
SELECT query_id, 'source' AS facet, source AS value, count(*)::BIGINT AS n
FROM hits GROUP BY 1, 3
""",
        # wildcard: the query's terms are every corpus term starting with
        # the prefix; scoring identical to the bag-of-words oracle
        "prefix_topk": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
q(query_id, prefix, k) AS (VALUES (0,'s',10),(1,'v',10),(2,'qu',10),
                                  (3,'zz',10),(4,'b',10)),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
qt AS (SELECT q.query_id, q.k, df.term
       FROM q JOIN df ON df.term LIKE q.prefix || '%'),
scores AS (
  SELECT qt.query_id, qt.k, tf.doc_id,
    sum( ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) *
         tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1,2,3),
ranked AS (SELECT query_id, k, doc_id, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM scores)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, doc_id,
       round(score, 6) AS score
FROM ranked WHERE rank <= k
""",
        # leading/trailing wildcard: the query's terms are every corpus
        # term matching the LIKE pattern (from api.PINNED_WILDCARD);
        # scoring identical to the bag-of-words oracle
        "wildcard_topk": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
q(query_id, pat, k) AS (VALUES (0,'%er',10),(1,'%ow',10),(2,'%or%',10),
                               (3,'%alu%',10),(4,'val%',10),(5,'table',10),
                               (6,'%zz',10)),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
qt AS (SELECT q.query_id, q.k, df.term
       FROM q JOIN df ON df.term LIKE q.pat),
scores AS (
  SELECT qt.query_id, qt.k, tf.doc_id,
    sum( ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) *
         tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1,2,3),
ranked AS (SELECT query_id, k, doc_id, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM scores)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, doc_id,
       round(score, 6) AS score
FROM ranked WHERE rank <= k
""",
        # multimodal fixture (api.MEDIA_*): the Ray side round-trips
        # real BMP bytes through ImageDecodeStage (magic sniff ->
        # decode_bmp); the oracle computes the same pinned integer pixel
        # spec (doc_id*7 + y*31 + x*13 + c*97) % 256 in closed form
        "media_pixel_stats": """
WITH m AS (SELECT doc_id FROM documents WHERE doc_id % 7 = 0),
px AS (SELECT m.doc_id,
              (m.doc_id*7 + y.range*31 + x.range*13) % 256 AS r,
              (m.doc_id*7 + y.range*31 + x.range*13 + 97) % 256 AS g,
              (m.doc_id*7 + y.range*31 + x.range*13 + 194) % 256 AS b
       FROM m CROSS JOIN range(16) y CROSS JOIN range(16) x)
SELECT doc_id, sum(r)::BIGINT AS sum_r, sum(g)::BIGINT AS sum_g,
       sum(b)::BIGINT AS sum_b
FROM px GROUP BY doc_id
""",
        # audio fingerprints: real WAV decode on the Ray side
        # (AudioFingerprintStage: 8 windows x 33 band energies ->
        # intra-window delta -> time double-delta -> 32 sign bits); the
        # oracle mirrors the integer spec v(i) = (doc_id*31 + i*i*7) %
        # 1449 - 724 — float32 band energies are exact at this sample
        # amplitude, so sign bits match bit-for-bit
        "audio_fingerprints": """
WITH m AS (SELECT doc_id FROM documents WHERE doc_id % 7 = 0),
s AS (SELECT m.doc_id, i.range AS i,
             (m.doc_id*31 + i.range*i.range*7) % 1449 - 724 AS v
      FROM m CROSS JOIN range(2048) i),
be AS (SELECT doc_id, (i // 256) AS w, ((i % 256) // 7) AS b,
              sum(v*v)::BIGINT AS e
       FROM s WHERE (i % 256) < 231 GROUP BY 1, 2, 3),
d AS (SELECT doc_id, w, b,
             e - lead(e) OVER (PARTITION BY doc_id, w ORDER BY b) AS d
      FROM be QUALIFY b < 32),
dd AS (SELECT doc_id, w, b,
              d - lag(d) OVER (PARTITION BY doc_id, b ORDER BY w) AS dd
       FROM d QUALIFY w >= 1),
fp AS (SELECT doc_id, (w - 1)::INT AS win,
              sum(CASE WHEN dd > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS fp
       FROM dd GROUP BY 1, 2)
SELECT doc_id, win, fp FROM fp
""",
        # language-partitioned BM25 (api.PINNED_PER_LANG): every doc
        # scores against ITS OWN language's collection statistics —
        # n_docs/avgdl/df all partitioned by lang (the per-lang index
        # family), then one global ranking (score desc, doc_id asc)
        "bm25_topk_per_lang": f"""
WITH tok AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, lang, len(toks) AS dl FROM tok),
stats AS (SELECT lang, count(*)::DOUBLE AS n_docs,
                 avg(dl)::DOUBLE AS avgdl
          FROM dl GROUP BY lang),
q(query_id, text, k) AS (VALUES (0,'table',10),(1,'spark merge',10),
                                (2,'window sort key',10),(3,'zzzabsent',10),
                                (4,'value value',10)),
qt AS (SELECT DISTINCT query_id, k,
              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM q),
terms AS (SELECT doc_id, lang, unnest(toks) AS term FROM tok),
tf AS (SELECT doc_id, lang, term, count(*)::DOUBLE AS tf
       FROM terms GROUP BY 1,2,3),
df AS (SELECT lang, term, count(*)::DOUBLE AS df FROM tf GROUP BY 1,2),
scores AS (
  SELECT qt.query_id, qt.k, tf.doc_id, tf.lang,
    sum( ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) *
         tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term AND df.lang = tf.lang
  JOIN dl ON dl.doc_id = tf.doc_id
  JOIN stats s ON s.lang = tf.lang
  GROUP BY 1,2,3,4),
ranked AS (SELECT query_id, k, doc_id, lang, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM scores)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, doc_id, lang,
       round(score, 6) AS score
FROM ranked WHERE rank <= k
""",
        # multi-field weighted BM25 (api.PINNED_FIELDED, weights content
        # x1 / source x2): each field scores with its OWN df/avgdl over
        # its own token stream; docs combine via full outer join so a
        # doc hit in only one field still ranks
        "fielded_topk": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
stok AS (SELECT doc_id,
                regexp_extract_all(lower(source), '[a-z0-9]+') AS toks
         FROM documents),
sdl AS (SELECT doc_id, len(toks) AS dl FROM stok),
sstats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl
           FROM sdl),
q(query_id, cq, sq, k) AS (VALUES
    (0,'table','src18',10),(1,'spark merge','src7',10),
    (2,'','src12',10),(3,'window sort','',10),
    (4,'value','zzznope',10),(5,'zzzabsent','zzznope',10)),
cqt AS (SELECT DISTINCT query_id,
               unnest(regexp_extract_all(lower(cq), '[a-z0-9]+')) AS term
        FROM q),
sqt AS (SELECT DISTINCT query_id,
               unnest(regexp_extract_all(lower(sq), '[a-z0-9]+')) AS term
        FROM q),
cterms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
ctf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM cterms GROUP BY 1,2),
cdf AS (SELECT term, count(*)::DOUBLE AS df FROM ctf GROUP BY 1),
sterms AS (SELECT doc_id, unnest(toks) AS term FROM stok),
stf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM sterms GROUP BY 1,2),
sdf AS (SELECT term, count(*)::DOUBLE AS df FROM stf GROUP BY 1),
cscores AS (
  SELECT cqt.query_id, ctf.doc_id,
    sum( ln((s.n_docs - cdf.df + 0.5)/(cdf.df + 0.5) + 1) *
         ctf.tf*(1.2+1)/(ctf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM cqt JOIN ctf ON ctf.term = cqt.term
  JOIN cdf ON cdf.term = cqt.term
  JOIN dl ON dl.doc_id = ctf.doc_id CROSS JOIN stats s
  GROUP BY 1,2),
sscores AS (
  SELECT sqt.query_id, stf.doc_id,
    sum( ln((s.n_docs - sdf.df + 0.5)/(sdf.df + 0.5) + 1) *
         stf.tf*(1.2+1)/(stf.tf + 1.2*(1 - 0.75 + 0.75*sdl.dl/s.avgdl)) ) AS score
  FROM sqt JOIN stf ON stf.term = sqt.term
  JOIN sdf ON sdf.term = sqt.term
  JOIN sdl ON sdl.doc_id = stf.doc_id CROSS JOIN sstats s
  GROUP BY 1,2),
comb AS (
  SELECT COALESCE(c.query_id, s.query_id) AS query_id,
         COALESCE(c.doc_id, s.doc_id) AS doc_id,
         1.0*COALESCE(c.score, 0) + 2.0*COALESCE(s.score, 0) AS score
  FROM cscores c FULL OUTER JOIN sscores s
    ON c.query_id = s.query_id AND c.doc_id = s.doc_id),
ranked AS (SELECT comb.query_id, q.k, comb.doc_id, comb.score,
                  row_number() OVER (PARTITION BY comb.query_id
                                     ORDER BY comb.score DESC,
                                              comb.doc_id ASC) AS rank
           FROM comb JOIN q ON q.query_id = comb.query_id)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, doc_id,
       round(score, 6) AS score
FROM ranked WHERE rank <= k
""",
        # fuzzy: the query's terms are every corpus term within edit
        # distance 1 of any query token (generated from api.PINNED_FUZZY);
        # scoring identical to the bag-of-words oracle
        "fuzzy_topk": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
q(query_id, text, k) AS (VALUES (0,'tabl',10),(1,'vallue',10),
                                (2,'windoe',10),(3,'zzzabsent',10),
                                (4,'quer merge',10),(5,'ke',10)),
qterm AS (SELECT DISTINCT query_id, k,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS qt
          FROM q),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
qt AS (SELECT DISTINCT qterm.query_id, qterm.k, df.term
       FROM qterm JOIN df ON levenshtein(df.term, qterm.qt) <= 1),
scores AS (
  SELECT qt.query_id, qt.k, tf.doc_id,
    sum( ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) *
         tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1,2,3),
ranked AS (SELECT query_id, k, doc_id, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM scores)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, doc_id,
       round(score, 6) AS score
FROM ranked WHERE rank <= k
""",
        # conjunctive: same scorer, restricted to docs matching EVERY
        # distinct query term (count of matched terms = the query's
        # distinct-term count)
        "bm25_topk_and": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
q(query_id, text, k) AS (VALUES (0,'table',10),(1,'spark merge',10),
                                (2,'window sort key',10),(3,'zzzabsent',10),
                                (4,'value value',10)),
qt AS (SELECT DISTINCT query_id, k,
              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM q),
qn AS (SELECT query_id, count(*) AS nt FROM qt GROUP BY 1),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
scores AS (
  SELECT qt.query_id, qt.k, tf.doc_id,
    sum( ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) *
         tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN qn ON qn.query_id = qt.query_id
  JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1,2,3
  HAVING count(*) = max(qn.nt)),
ranked AS (SELECT query_id, k, doc_id, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM scores)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, doc_id,
       round(score, 6) AS score
FROM ranked WHERE rank <= k
""",
        # did-you-mean: exactly-edit-distance-1 dictionary terms by df
        "spell_correct": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
terms AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM tok),
df AS (SELECT term, count(*)::BIGINT AS df FROM terms GROUP BY 1),
q(query_id, qt) AS (VALUES (0,'tabl'),(1,'vallue'),(2,'windoe'),
                           (3,'zzzabsent'),(4,'merge')),
cand AS (SELECT q.query_id, df.term, df.df,
                row_number() OVER (PARTITION BY q.query_id
                                   ORDER BY df.df DESC, df.term ASC) AS srank
         FROM q JOIN df ON levenshtein(df.term, q.qt) = 1)
SELECT query_id::BIGINT AS query_id, term, df, srank::INT AS srank
FROM cand WHERE srank <= 3 ORDER BY 1, 4
""",
        # term boosting: scorer CTE with a per-term weight joined in
        "boosted_topk": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
q(query_id, text, k) AS (VALUES (0,'table value',10),(1,'spark merge',10),
                                (2,'window zzzabsent',10),
                                (3,'window sort key',10),(4,'value value',10)),
boost(term, w) AS (VALUES ('table', 3.0), ('merge', 0.25),
                          ('zzzabsent', 9.0)),
qt AS (SELECT DISTINCT query_id, k,
              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM q),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
scores AS (
  SELECT qt.query_id, qt.k, tf.doc_id,
    sum( coalesce(b.w, 1.0) *
         ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) *
         tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  LEFT JOIN boost b ON b.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1,2,3),
ranked AS (SELECT query_id, k, doc_id, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM scores)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, doc_id,
       round(score, 6) AS score
FROM ranked WHERE rank <= k
""",
        # pseudo-relevance feedback: stage-1 BM25 top-10 feedback docs,
        # 3 expansion terms by integer-exact tf-idf (summed feedback tf x
        # floor(ln((N+1)/(df+1))*1e6+0.5), ties term asc, original terms
        # excluded), stage-2 boosted BM25 (expansion weight 0.5)
        "prf_topk": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
q(query_id, text) AS (VALUES (0,'table'),(1,'spark merge'),
                             (2,'window sort key'),(3,'zzzabsent'),
                             (4,'value value')),
qt AS (SELECT DISTINCT query_id,
              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM q),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
s1 AS (
  SELECT qt.query_id, tf.doc_id,
    sum( ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) *
         tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1,2),
fb AS (SELECT query_id, doc_id FROM (
         SELECT query_id, doc_id,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id ASC) AS rank
         FROM s1) WHERE rank <= 10),
ftf AS (SELECT f.query_id, t.term, sum(t.tf)::BIGINT AS tfs
        FROM fb f JOIN tf t ON t.doc_id = f.doc_id GROUP BY 1,2),
cand AS (SELECT c.query_id, c.term,
                c.tfs * CAST(floor(ln((s.n_docs + 1.0)/(df.df + 1.0))
                                   * 1000000 + 0.5) AS BIGINT) AS sc
         FROM ftf c JOIN df ON df.term = c.term CROSS JOIN stats s
         LEFT JOIN qt ON qt.query_id = c.query_id AND qt.term = c.term
         WHERE qt.term IS NULL),
exp AS (SELECT query_id, term FROM (
          SELECT query_id, term,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sc DESC, term ASC) AS rnk
          FROM cand) WHERE rnk <= 3),
q2 AS (SELECT query_id, term, 1.0 AS w FROM qt
       UNION ALL SELECT query_id, term, 0.5 AS w FROM exp),
s2 AS (
  SELECT q2.query_id, tf.doc_id,
    sum( q2.w * ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) *
         tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM q2 JOIN tf ON tf.term = q2.term
  JOIN df ON df.term = q2.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1,2),
ranked2 AS (SELECT query_id, doc_id, score,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, doc_id ASC) AS rank
            FROM s2)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, doc_id,
       round(score, 6) AS score
FROM ranked2 WHERE rank <= 10
""",
        # statically pruned index (Carmel): per term keep the top
        # ceil(0.5*df) postings by (tf desc, doc asc); idf from the
        # PRUNED df, dl/avgdl/N from the full corpus
        "pruned_topk": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
q(query_id, text, k) AS (VALUES (0,'table',10),(1,'spark merge',10),
                                (2,'window sort key',10),(3,'zzzabsent',10),
                                (4,'value value',10)),
qt AS (SELECT DISTINCT query_id, k,
              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM q),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf0 AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
keepn AS (SELECT term,
                 greatest(1, CAST(ceil(0.5 * count(*) - 1e-9) AS BIGINT)) AS kn
          FROM tf0 GROUP BY term),
ptf AS (SELECT doc_id, term, tf FROM (
          SELECT t.doc_id, t.term, t.tf, k.kn,
                 row_number() OVER (PARTITION BY t.term
                                    ORDER BY t.tf DESC, t.doc_id ASC) AS rn
          FROM tf0 t JOIN keepn k USING (term)) WHERE rn <= kn),
pdf AS (SELECT term, count(*)::DOUBLE AS df FROM ptf GROUP BY 1),
scores AS (
  SELECT qt.query_id, qt.k, p.doc_id,
    sum( ln((s.n_docs - pdf.df + 0.5)/(pdf.df + 0.5) + 1) *
         p.tf*(1.2+1)/(p.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN ptf p ON p.term = qt.term
  JOIN pdf ON pdf.term = qt.term
  JOIN dl ON dl.doc_id = p.doc_id CROSS JOIN stats s
  GROUP BY 1,2,3),
ranked AS (SELECT query_id, k, doc_id, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM scores)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, doc_id,
       round(score, 6) AS score
FROM ranked WHERE rank <= k
""",
        # tiered serving: pruned tier-1 answers unless it has < k
        # matching docs for the query, then the full index answers
        "tiered_topk": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
q(query_id, text, k) AS (VALUES (0,'table',10),(1,'spark merge',10),
                                (2,'window sort key',10),(3,'zzzabsent',10),
                                (4,'value value',10),(5,'dup',20)),
qt AS (SELECT DISTINCT query_id, k,
              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM q),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf0 AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
keepn AS (SELECT term,
                 greatest(1, CAST(ceil(0.5 * count(*) - 1e-9) AS BIGINT)) AS kn
          FROM tf0 GROUP BY term),
ptf AS (SELECT doc_id, term, tf FROM (
          SELECT t.doc_id, t.term, t.tf, kk.kn,
                 row_number() OVER (PARTITION BY t.term
                                    ORDER BY t.tf DESC, t.doc_id ASC) AS rn
          FROM tf0 t JOIN keepn kk USING (term)) WHERE rn <= kn),
pdf AS (SELECT term, count(*)::DOUBLE AS df FROM ptf GROUP BY 1),
fdf AS (SELECT term, count(*)::DOUBLE AS df FROM tf0 GROUP BY 1),
pscores AS (
  SELECT qt.query_id, qt.k, p.doc_id,
    sum( ln((s.n_docs - pdf.df + 0.5)/(pdf.df + 0.5) + 1) *
         p.tf*(1.2+1)/(p.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN ptf p ON p.term = qt.term
  JOIN pdf ON pdf.term = qt.term
  JOIN dl ON dl.doc_id = p.doc_id CROSS JOIN stats s
  GROUP BY 1,2,3),
fscores AS (
  SELECT qt.query_id, qt.k, t.doc_id,
    sum( ln((s.n_docs - fdf.df + 0.5)/(fdf.df + 0.5) + 1) *
         t.tf*(1.2+1)/(t.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN tf0 t ON t.term = qt.term
  JOIN fdf ON fdf.term = qt.term
  JOIN dl ON dl.doc_id = t.doc_id CROSS JOIN stats s
  GROUP BY 1,2,3),
pcnt AS (SELECT query_id, count(*) AS c FROM pscores GROUP BY 1),
cand AS (
  SELECT s.query_id, s.k, s.doc_id, s.score, 1 AS tier
  FROM pscores s JOIN pcnt ON pcnt.query_id = s.query_id AND pcnt.c >= s.k
  UNION ALL
  SELECT s.query_id, s.k, s.doc_id, s.score, 2 AS tier
  FROM fscores s LEFT JOIN pcnt ON pcnt.query_id = s.query_id
  WHERE coalesce(pcnt.c, 0) < s.k),
ranked AS (SELECT query_id, k, doc_id, score, tier,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM cand)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, doc_id,
       round(score, 6) AS score, tier::INT AS tier
FROM ranked WHERE rank <= k
""",
        # best-passage-per-document (MaxP) retrieval: the pinned 500/400
        # chunking as a passage corpus, BM25 over chunks, best chunk per
        # parent (score desc, chunk asc), parents ranked
        "passage_topk": f"""
WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents),
ch AS MATERIALIZED (
  SELECT doc_id * 100000 + i AS cid, doc_id AS parent, i AS chunk_id,
         substr(text, (i * 400 + 1)::BIGINT, 500) AS ctext
  FROM (SELECT doc_id, text,
               unnest(range(0, CASE WHEN n <= 500 THEN 1
                                    ELSE 1 + ((n - 500 + 399) // 400) END)) AS i
        FROM t)),
ptok AS MATERIALIZED (
  SELECT cid, parent, chunk_id,
         regexp_extract_all(lower(ctext), '[a-z0-9]+') AS toks FROM ch),
pdl AS MATERIALIZED (SELECT cid, parent, chunk_id, len(toks) AS dl FROM ptok),
pstats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM pdl),
q(query_id, text, k) AS (VALUES (0,'table',10),(1,'spark merge',10),
                                (2,'window sort key',10),(3,'zzzabsent',10),
                                (4,'value value',10)),
qt AS (SELECT DISTINCT query_id, k,
              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM q),
pterms AS (SELECT cid, unnest(toks) AS term FROM ptok),
ptf AS (SELECT cid, term, count(*)::DOUBLE AS tf FROM pterms GROUP BY 1,2),
pdf AS (SELECT term, count(*)::DOUBLE AS df FROM ptf GROUP BY 1),
pscores AS (
  SELECT qt.query_id, qt.k, ptf.cid,
    sum( ln((s.n_docs - pdf.df + 0.5)/(pdf.df + 0.5) + 1) *
         ptf.tf*(1.2+1)/(ptf.tf + 1.2*(1 - 0.75 + 0.75*d.dl/s.avgdl)) ) AS score
  FROM qt JOIN ptf ON ptf.term = qt.term
  JOIN pdf ON pdf.term = qt.term
  JOIN pdl d ON d.cid = ptf.cid CROSS JOIN pstats s
  GROUP BY 1,2,3),
best AS (SELECT query_id, k, parent, chunk_id, score FROM (
  SELECT s.query_id, s.k, d.parent, d.chunk_id, s.score,
         row_number() OVER (PARTITION BY s.query_id, d.parent
                            ORDER BY s.score DESC, s.cid ASC) AS rn
  FROM pscores s JOIN pdl d ON d.cid = s.cid) WHERE rn = 1),
ranked AS (SELECT query_id, k, parent, chunk_id, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, parent ASC) AS rank
           FROM best)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank,
       parent AS doc_id, chunk_id::BIGINT AS chunk_id,
       round(score, 6) AS score
FROM ranked WHERE rank <= k
""",
        # retrieval-quality metrics: BM25 top-10 run scored against the
        # conjunctive-match relevance set (binary qrels derived from the
        # corpus itself); precision@10, MRR, nDCG@10
        "search_eval": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
q(query_id, text, k) AS (VALUES (0,'table',10),(1,'spark merge',10),
                                (2,'window sort key',10),(3,'zzzabsent',10),
                                (4,'value value',10)),
qt AS (SELECT DISTINCT query_id, k,
              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM q),
nqt AS (SELECT query_id, count(DISTINCT term) AS nt FROM qt GROUP BY 1),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
rel AS (SELECT x.query_id, x.doc_id FROM (
          SELECT qt.query_id, tf.doc_id, count(DISTINCT tf.term) AS c
          FROM qt JOIN tf ON tf.term = qt.term GROUP BY 1,2) x
        JOIN nqt ON nqt.query_id = x.query_id AND nqt.nt = x.c),
scores AS (
  SELECT qt.query_id, qt.k, tf.doc_id,
    sum( ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) *
         tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1,2,3),
run AS (SELECT query_id, k, doc_id, rank FROM (
          SELECT query_id, k, doc_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY score DESC, doc_id ASC) AS rank
          FROM scores) WHERE rank <= k),
nrel AS (SELECT query_id, count(*) AS n_rel FROM rel GROUP BY 1),
hits AS (SELECT r.query_id, r.rank FROM run r
         JOIN rel ON rel.query_id = r.query_id AND rel.doc_id = r.doc_id),
dcg AS (SELECT query_id, sum(1.0/log2(rank + 1)) AS dcg,
               count(*) AS nhit, min(rank) AS minr
        FROM hits GROUP BY 1),
idcg AS (SELECT q.query_id, sum(1.0/log2(i + 1)) AS idcg
         FROM q JOIN nrel USING (query_id),
              unnest(generate_series(1, least(nrel.n_rel, q.k))) AS t(i)
         GROUP BY 1)
SELECT q.query_id::BIGINT AS query_id,
       coalesce(nrel.n_rel, 0)::BIGINT AS n_rel,
       round(coalesce(d.nhit, 0)::DOUBLE / q.k, 6) AS p_at_k,
       round(coalesce(1.0 / d.minr, 0), 6) AS mrr,
       round(CASE WHEN coalesce(i.idcg, 0) > 0
                  THEN coalesce(d.dcg, 0) / i.idcg ELSE 0 END, 6) AS ndcg
FROM q LEFT JOIN nrel USING (query_id)
LEFT JOIN dcg d USING (query_id) LEFT JOIN idcg i USING (query_id)
""",
        # BM25F (generated semantics from api.PINNED_BM25F): per-field
        # normalized+weighted tfs blended into one pseudo-tf, saturated
        # once; idf from the union doc set across fields
        "bm25f_topk": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stok AS (SELECT doc_id,
                regexp_extract_all(lower(source), '[a-z0-9]+') AS toks
         FROM documents),
sdl AS (SELECT doc_id, len(toks) AS dl FROM stok),
fstats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
                  (SELECT avg(dl) FROM dl)::DOUBLE AS avgdl_c,
                  (SELECT avg(dl) FROM sdl)::DOUBLE AS avgdl_s),
q(query_id, text, k) AS (VALUES (0,'table src18',10),(1,'spark merge',10),
                                (2,'src12',10),(3,'zzzabsent',10),
                                (4,'value value src7',10)),
qt AS (SELECT DISTINCT query_id, k,
              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM q),
cterms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
ctf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM cterms GROUP BY 1,2),
sterms AS (SELECT doc_id, unnest(toks) AS term FROM stok),
stf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM sterms GROUP BY 1,2),
dfu AS (SELECT term, count(*)::DOUBLE AS df FROM (
          SELECT DISTINCT doc_id, term FROM cterms
          UNION SELECT DISTINCT doc_id, term FROM sterms) GROUP BY 1),
pair AS (SELECT coalesce(c.doc_id, s.doc_id) AS doc_id,
                coalesce(c.term, s.term) AS term,
                coalesce((1.0 * c.tf) / (1 - 0.75 + 0.75 * dl.dl / st.avgdl_c), 0)
              + coalesce((2.0 * s.tf) / (1 - 0.75 + 0.75 * sdl.dl / st.avgdl_s), 0) AS tfw
         FROM ctf c FULL OUTER JOIN stf s
           ON s.doc_id = c.doc_id AND s.term = c.term
         LEFT JOIN dl ON dl.doc_id = coalesce(c.doc_id, s.doc_id)
         LEFT JOIN sdl ON sdl.doc_id = coalesce(c.doc_id, s.doc_id)
         CROSS JOIN fstats st),
fscores AS (
  SELECT qt.query_id, qt.k, p.doc_id,
    sum( ln((st.n_docs - dfu.df + 0.5)/(dfu.df + 0.5) + 1)
         * p.tfw * (1.2 + 1) / (p.tfw + 1.2) ) AS score
  FROM qt JOIN pair p ON p.term = qt.term
  JOIN dfu ON dfu.term = qt.term CROSS JOIN fstats st
  GROUP BY 1,2,3),
ranked AS (SELECT query_id, k, doc_id, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM fscores)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, doc_id,
       round(score, 6) AS score
FROM ranked WHERE rank <= k
""",
        # nested boolean DSL (generated semantics from api.PINNED_BOOL):
        # per-query EXISTS set algebra for the match set, disjunctive
        # BM25 over the positive-context terms (negated terms filter but
        # never score), matches with no positive term keep score 0
        "bool_topk": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
has AS (SELECT DISTINCT doc_id, term FROM terms),
m(query_id, doc_id) AS (
  -- q0: table AND (value OR key)
  SELECT 0, d.doc_id FROM dl d
   WHERE EXISTS (SELECT 1 FROM has h WHERE h.doc_id=d.doc_id AND h.term='table')
     AND (EXISTS (SELECT 1 FROM has h WHERE h.doc_id=d.doc_id AND h.term='value')
          OR EXISTS (SELECT 1 FROM has h WHERE h.doc_id=d.doc_id AND h.term='key'))
  UNION ALL
  -- q1: spark OR merge NOT window   (OR loosest; NOT = minus)
  SELECT 1, d.doc_id FROM dl d
   WHERE EXISTS (SELECT 1 FROM has h WHERE h.doc_id=d.doc_id AND h.term='spark')
      OR (EXISTS (SELECT 1 FROM has h WHERE h.doc_id=d.doc_id AND h.term='merge')
          AND NOT EXISTS (SELECT 1 FROM has h WHERE h.doc_id=d.doc_id AND h.term='window'))
  UNION ALL
  -- q2: (sort OR window) NOT (key AND value)
  SELECT 2, d.doc_id FROM dl d
   WHERE (EXISTS (SELECT 1 FROM has h WHERE h.doc_id=d.doc_id AND h.term='sort')
          OR EXISTS (SELECT 1 FROM has h WHERE h.doc_id=d.doc_id AND h.term='window'))
     AND NOT (EXISTS (SELECT 1 FROM has h WHERE h.doc_id=d.doc_id AND h.term='key')
              AND EXISTS (SELECT 1 FROM has h WHERE h.doc_id=d.doc_id AND h.term='value'))
  UNION ALL
  -- q3: zzzabsent AND table   (empty)
  SELECT 3, d.doc_id FROM dl d
   WHERE EXISTS (SELECT 1 FROM has h WHERE h.doc_id=d.doc_id AND h.term='zzzabsent')
     AND EXISTS (SELECT 1 FROM has h WHERE h.doc_id=d.doc_id AND h.term='table')
  UNION ALL
  -- q4: table value   (implicit AND)
  SELECT 4, d.doc_id FROM dl d
   WHERE EXISTS (SELECT 1 FROM has h WHERE h.doc_id=d.doc_id AND h.term='table')
     AND EXISTS (SELECT 1 FROM has h WHERE h.doc_id=d.doc_id AND h.term='value')
),
st(query_id, term) AS (VALUES (0,'table'),(0,'value'),(0,'key'),
                              (1,'spark'),(1,'merge'),
                              (2,'sort'),(2,'window'),
                              (3,'zzzabsent'),(3,'table'),
                              (4,'table'),(4,'value')),
contrib AS (
  SELECT st.query_id, tf.doc_id,
    sum( ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) *
         tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM st JOIN tf ON tf.term = st.term
  JOIN df ON df.term = st.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1,2),
scored AS (SELECT m.query_id, m.doc_id, coalesce(c.score, 0.0) AS score
           FROM m LEFT JOIN contrib c
             ON c.query_id = m.query_id AND c.doc_id = m.doc_id),
ranked AS (SELECT query_id, doc_id, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM scored)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, doc_id,
       round(score, 6) AS score
FROM ranked WHERE rank <= 10
""",
        # exact hit counts: union cardinality of matching docs per query
        "hit_counts": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
q(query_id, text) AS (VALUES (0,'table'),(1,'spark merge'),
                             (2,'window sort key'),(3,'zzzabsent'),
                             (4,'value value')),
qt AS (SELECT DISTINCT query_id,
              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM q),
terms AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM tok)
SELECT query_id::BIGINT AS query_id,
       count(DISTINCT doc_id)::BIGINT AS n_hits
FROM qt JOIN terms USING (term) GROUP BY 1 ORDER BY 1
""",
        # synonym expansion: the engine's expanded term sets, written out
        # literally (merge->join, sort->order, fast->quick[absent])
        "synonym_topk": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
q(query_id, text, k) AS (VALUES (0,'merge join',10),(1,'sort order key',10),
                                (2,'fast quick',10),(3,'table merge join',10),
                                (4,'zzzabsent',10)),
qt AS (SELECT DISTINCT query_id, k,
              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM q),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
scores AS (
  SELECT qt.query_id, qt.k, tf.doc_id,
    sum( ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) *
         tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1,2,3),
ranked AS (SELECT query_id, k, doc_id, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM scores)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, doc_id,
       round(score, 6) AS score
FROM ranked WHERE rank <= k
""",
        # cursor pagination: page 2 == global ranks (k, 2k]; a query with
        # fewer than k+1 hits has no page 2
        "search_page2": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
q(query_id, text, k) AS (VALUES (0,'table',10),(1,'spark merge',10),
                                (2,'window sort key',10),(3,'zzzabsent',10),
                                (4,'value value',10)),
qt AS (SELECT DISTINCT query_id, k,
              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM q),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
scores AS (
  SELECT qt.query_id, qt.k, tf.doc_id,
    sum( ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) *
         tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1,2,3),
ranked AS (SELECT query_id, k, doc_id, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM scores)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, doc_id,
       round(score, 6) AS score
FROM ranked WHERE rank > k AND rank <= 2*k
""",
        # score explain: the per-term contribution rows BEFORE the scorer's
        # GROUP BY sum, restricted to each query's ranked top-k page
        "explain_scores": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
q(query_id, text, k) AS (VALUES (0,'table',10),(1,'spark merge',10),
                                (2,'window sort key',10),(3,'zzzabsent',10),
                                (4,'value value',10)),
qt AS (SELECT DISTINCT query_id, k,
              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM q),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT qt.query_id, qt.k, tf.doc_id, qt.term, tf.tf, df.df::BIGINT AS df,
    ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) *
      tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) AS contribution
  FROM qt JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s),
scores AS (SELECT query_id, k, doc_id, sum(contribution) AS score
           FROM contrib GROUP BY 1,2,3),
ranked AS (SELECT query_id, k, doc_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM scores)
SELECT c.query_id::BIGINT AS query_id, c.doc_id, c.term, c.tf, c.df,
       round(c.contribution, 6) AS contribution
FROM contrib c JOIN ranked r ON r.query_id = c.query_id AND r.doc_id = c.doc_id
WHERE r.rank <= r.k
ORDER BY 1, 2, 3
""",
        # min_should_match: same scorer, restricted to docs matching at
        # least m distinct query terms (m=1 == disjunctive, m=n == AND)
        "bm25_topk_msm": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
q(query_id, text, m, k) AS (VALUES (0,'window sort key',2,10),
                                   (1,'table value',1,10),
                                   (2,'spark merge',2,10),
                                   (3,'window sort zzzabsent',2,10),
                                   (4,'value value',2,10)),
qt AS (SELECT DISTINCT query_id, m, k,
              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM q),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
scores AS (
  SELECT qt.query_id, qt.k, tf.doc_id,
    sum( ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) *
         tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1,2,3
  HAVING count(*) >= max(qt.m)),
ranked AS (SELECT query_id, k, doc_id, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM scores)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, doc_id,
       round(score, 6) AS score
FROM ranked WHERE rank <= k
""",
        # facet-filtered retrieval: scoring as bm25_topk, docs restricted
        # to lang='en' BEFORE ranking/truncation
        "filtered_topk": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
q(query_id, text, k) AS (VALUES (0,'table',10),(1,'spark merge',10),
                                (2,'window sort key',10),(3,'zzzabsent',10),
                                (4,'value value',10)),
qt AS (SELECT DISTINCT query_id, k,
              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM q),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
scores AS (
  SELECT qt.query_id, qt.k, tf.doc_id,
    sum( ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) *
         tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1,2,3),
ranked AS (SELECT sc.query_id, sc.k, sc.doc_id, sc.score,
                  row_number() OVER (PARTITION BY sc.query_id
                                     ORDER BY sc.score DESC, sc.doc_id ASC) AS rank
           FROM scores sc JOIN documents d ON d.doc_id = sc.doc_id
           WHERE d.lang = 'en')
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, doc_id,
       round(score, 6) AS score
FROM ranked WHERE rank <= k
""",
        # R-threshold retrieval: same BM25 chain, hits with
        # round(score,6) < R dropped before ranking (short pages)
        "threshold_topk": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
q(query_id, text, k) AS (VALUES (0,'table',10),(1,'spark merge',10),
                                (2,'window sort key',10),(3,'zzzabsent',10),
                                (4,'value value',10)),
qt AS (SELECT DISTINCT query_id, k,
              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM q),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
scores AS (
  SELECT qt.query_id, qt.k, tf.doc_id,
    sum( ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) *
         tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1,2,3),
ranked AS (SELECT query_id, k, doc_id, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM scores WHERE round(score, 6) >= {api.THRESHOLD_R})
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, doc_id,
       round(score, 6) AS score
FROM ranked WHERE rank <= k
""",
        # field-sorted retrieval: OR-match hit set ordered by n_chars
        # (longest first, ties doc_id asc), not by BM25
        "sorted_topk": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
q(query_id, text, k) AS (VALUES (0,'table',10),(1,'spark merge',10),
                                (2,'window sort key',10),(3,'zzzabsent',10),
                                (4,'value value',10)),
qt AS (SELECT DISTINCT query_id, k,
              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM q),
terms AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM tok),
hits AS (SELECT DISTINCT qt.query_id, qt.k, t.doc_id
         FROM qt JOIN terms t ON t.term = qt.term),
ranked AS (SELECT h.query_id, h.k, h.doc_id, d.n_chars,
                  row_number() OVER (PARTITION BY h.query_id
                                     ORDER BY d.n_chars DESC, h.doc_id ASC)
                      AS rank
           FROM hits h JOIN documents d ON d.doc_id = h.doc_id)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, doc_id,
       n_chars
FROM ranked WHERE rank <= k
""",
        # field collapse: best-scoring doc per (query, source), survivors
        # re-ranked per query (ties everywhere: score desc, doc_id asc)
        "collapse_topk": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
q(query_id, text, k) AS (VALUES (0,'table',10),(1,'spark merge',10),
                                (2,'window sort key',10),(3,'zzzabsent',10),
                                (4,'value value',10)),
qt AS (SELECT DISTINCT query_id, k,
              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM q),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
scores AS (
  SELECT qt.query_id, qt.k, tf.doc_id,
    sum( ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) *
         tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1,2,3),
grouped AS (SELECT sc.query_id, sc.k, sc.doc_id, sc.score, d.source,
                   row_number() OVER (PARTITION BY sc.query_id, d.source
                                      ORDER BY sc.score DESC, sc.doc_id ASC) AS gr
            FROM scores sc JOIN documents d ON d.doc_id = sc.doc_id),
ranked AS (SELECT query_id, k, doc_id, score, source,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM grouped WHERE gr = 1)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, doc_id,
       round(score, 6) AS score, source
FROM ranked WHERE rank <= k
""",
        # two-stage retrieval: BM25 top-50 candidate set (identical to
        # the engine's stage 1), re-scored by tf-idf cosine (doc norm
        # over ALL doc terms; query vector from bag-of-words counts)
        "rerank_cosine": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
q(query_id, text, k) AS (VALUES (0,'table',10),(1,'spark merge',10),
                                (2,'window sort key',10),(3,'zzzabsent',10),
                                (4,'value value',10)),
qbag AS (SELECT query_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM q),
qtf AS (SELECT query_id, term, count(*)::DOUBLE AS qtf FROM qbag GROUP BY 1, 2),
qt AS (SELECT DISTINCT query_id, term FROM qbag),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
idf AS (SELECT term, ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) AS idf
        FROM df CROSS JOIN stats s),
bm25 AS (
  SELECT qt.query_id, tf.doc_id,
    sum( idf.idf *
         tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN tf ON tf.term = qt.term
  JOIN idf ON idf.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1,2),
cand AS (SELECT query_id, doc_id FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM bm25) WHERE rank <= {50}),
wd AS (SELECT tf.doc_id, tf.term, tf.tf * idf.idf AS w
       FROM tf JOIN idf ON idf.term = tf.term),
dnorm AS (SELECT doc_id, sqrt(sum(w*w)) AS nd FROM wd GROUP BY 1),
wq AS (SELECT qtf.query_id, qtf.term, qtf.qtf * idf.idf AS w
       FROM qtf JOIN idf ON idf.term = qtf.term),
qnorm AS (SELECT query_id, sqrt(sum(w*w)) AS nq FROM wq GROUP BY 1),
dot AS (SELECT c.query_id, c.doc_id, sum(wq.w * wd.w) AS dp
        FROM cand c
        JOIN wq ON wq.query_id = c.query_id
        JOIN wd ON wd.doc_id = c.doc_id AND wd.term = wq.term
        GROUP BY 1, 2),
cs AS (SELECT c.query_id, c.doc_id,
              coalesce(dot.dp, 0) / (qn.nq * dn.nd) AS cos
       FROM cand c
       LEFT JOIN dot ON dot.query_id = c.query_id AND dot.doc_id = c.doc_id
       JOIN qnorm qn ON qn.query_id = c.query_id
       JOIN dnorm dn ON dn.doc_id = c.doc_id),
rr AS (SELECT query_id, doc_id, cos,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, doc_id ASC) AS rank
       FROM cs)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, doc_id,
       round(cos, 6) AS cos_sim
FROM rr WHERE rank <= 10
""",
        # boolean NOT (generated semantics from api.PINNED_NOT): the
        # bag-of-words scorer restricted to docs with NO negated term
        "bm25_topk_not": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
q(query_id, text, neg, k) AS (VALUES (0,'table','value',10),
                                     (1,'spark merge','the',10),
                                     (2,'window','zzzabsent',10),
                                     (3,'zzzabsent','table',10),
                                     (4,'value value','value',10)),
qt AS (SELECT DISTINCT query_id, k,
              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM q),
nt AS (SELECT DISTINCT query_id,
              unnest(regexp_extract_all(lower(neg), '[a-z0-9]+')) AS term FROM q),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
scores AS (
  SELECT qt.query_id, qt.k, tf.doc_id,
    sum( ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) *
         tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  WHERE NOT EXISTS (SELECT 1 FROM tf x JOIN nt
                    ON nt.query_id = qt.query_id AND nt.term = x.term
                    WHERE x.doc_id = tf.doc_id)
  GROUP BY 1,2,3),
ranked AS (SELECT query_id, k, doc_id, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM scores)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, doc_id,
       round(score, 6) AS score
FROM ranked WHERE rank <= k
""",
        "bm25_topk_hydrated": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
q(query_id, text, k) AS (VALUES (0,'table',10),(1,'spark merge',10),
                                (2,'window sort key',10),(3,'zzzabsent',10),
                                (4,'value value',10)),
qt AS (SELECT DISTINCT query_id, k,
              unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM q),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
scores AS (
  SELECT qt.query_id, qt.k, tf.doc_id,
    sum( ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) *
         tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1,2,3),
ranked AS (SELECT query_id, k, doc_id, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM scores)
SELECT r.query_id::BIGINT AS query_id, r.rank::INT AS rank, r.doc_id,
       round(r.score, 6) AS score, d.source AS repo,
       CAST(d.doc_id AS VARCHAR) AS path, d.lang AS lang
FROM ranked r JOIN documents d ON d.doc_id = r.doc_id WHERE r.rank <= r.k
""",
        # more-like-this: the source doc's distinct terms ARE the query
        # (generated from api.PINNED_MLT_DOCS); scoring identical to the
        # bag-of-words oracle
        "similar_docs": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
qt AS (SELECT DISTINCT doc_id AS query_id, 10 AS k, unnest(toks) AS term
       FROM tok WHERE doc_id IN (0, 7, 42)),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
scores AS (
  SELECT qt.query_id, qt.k, tf.doc_id,
    sum( ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) *
         tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1,2,3),
ranked AS (SELECT query_id, k, doc_id, score,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id ASC) AS rank
           FROM scores)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank, doc_id,
       round(score, 6) AS score
FROM ranked WHERE rank <= k
""",
        "doclen_quantiles": f"""
WITH tok AS (SELECT lang, len({_TOKS})::BIGINT AS n_tokens FROM documents)
SELECT lang, count(*)::BIGINT AS n,
       quantile_disc(n_tokens, 0.5)::DOUBLE AS p50,
       quantile_disc(n_tokens, 0.95)::DOUBLE AS p95
FROM tok GROUP BY lang
""",
        "events_window": """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(value)::BIGINT AS n_events,
       CAST(round(sum(value) * 100, 0) AS BIGINT) AS sum_value_x100
FROM events GROUP BY 1, 2
""",
        # top-100 docs by token count via the native global sort
        "longest_docs": f"""
WITH c AS (SELECT doc_id, len({_TOKS})::BIGINT AS n_tokens FROM documents)
SELECT doc_id, n_tokens,
       row_number() OVER (ORDER BY n_tokens DESC, doc_id)::BIGINT AS rnk
FROM c ORDER BY n_tokens DESC, doc_id LIMIT 100
""",
        # hourly volume anomalies per type: |z| >= 2 with population
        # stddev from exact integer moments (s1, s2) — the float var/z
        # assembly order mirrors the numpy side exactly
        "events_anomalies": """
WITH b AS (SELECT event_type,
                  (epoch_us(ts) // 3600000000) * 3600000000
                      AS window_start_us,
                  count(*)::BIGINT AS n_events
           FROM events GROUP BY 1, 2),
m AS (SELECT event_type, count(*)::BIGINT AS c, sum(n_events)::BIGINT AS s1,
             sum(n_events * n_events)::BIGINT AS s2 FROM b GROUP BY 1),
z AS (SELECT b.event_type, b.window_start_us, b.n_events,
             CASE WHEN (m.s2::DOUBLE / m.c
                        - (m.s1::DOUBLE / m.c) * (m.s1::DOUBLE / m.c)) > 0
                  THEN (b.n_events - m.s1::DOUBLE / m.c)
                       / sqrt(m.s2::DOUBLE / m.c
                              - (m.s1::DOUBLE / m.c) * (m.s1::DOUBLE / m.c))
                  ELSE 0 END AS zz
      FROM b JOIN m USING (event_type))
SELECT event_type, window_start_us::BIGINT AS window_start_us, n_events,
       CAST(round(zz * 1000000, 0) AS BIGINT) AS z_x1e6
FROM z WHERE abs(CAST(round(zz * 1000000, 0) AS BIGINT)) >= 2000000
""",
        # cohort retention: first-active epoch-week cohorts x week offsets,
        # distinct users per cell (offset 0 = cohort size)
        "events_retention": """
WITH uw AS (SELECT DISTINCT user_id,
                   (epoch_us(ts) // 604800000000) AS wk FROM events),
coh AS (SELECT user_id, min(wk) AS cw FROM uw GROUP BY 1)
SELECT c.cw::BIGINT AS cohort_week, (u.wk - c.cw)::BIGINT AS offset_weeks,
       count(*)::BIGINT AS n_users
FROM uw u JOIN coh c USING (user_id) GROUP BY 1, 2
""",
        # sliding 1h windows every 15 min: each event joins its 4 windows
        "events_sliding": """
WITH w AS (SELECT time_bucket(INTERVAL 15 MINUTE, ts)
             - to_microseconds(i * 900000000) AS window_start,
           event_type, value
           FROM events CROSS JOIN (SELECT unnest(range(4)) AS i) s)
SELECT window_start, event_type,
       count(value)::BIGINT AS n_events,
       CAST(round(sum(value) * 100, 0) AS BIGINT) AS sum_value_x100
FROM w GROUP BY 1, 2
""",
        "lineitem_rollup": """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(l_quantity) * 100, 0) AS BIGINT) AS sum_qty_x100,
       count(*)::BIGINT AS count_order
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
        "lineitem_cube": """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(l_quantity) * 100, 0) AS BIGINT) AS sum_qty_x100,
       count(*)::BIGINT AS count_order
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
        # equal-width histogram of event values
        "value_histogram": """
SELECT floor(value / 10.0)::BIGINT AS bin, count(*)::BIGINT AS n
FROM events GROUP BY 1 ORDER BY 1
""",
        # grouped LIMIT: 3 longest docs per language
        "longest_per_lang": """
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents) t WHERE rn <= 3
""",
        # cross-tab: per-user counts, one column per pinned event type
        "events_pivot": """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click')::BIGINT AS n_click,
       count(*) FILTER (WHERE event_type = 'error')::BIGINT AS n_error,
       count(*) FILTER (WHERE event_type = 'purchase')::BIGINT AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup')::BIGINT AS n_signup,
       count(*) FILTER (WHERE event_type = 'view')::BIGINT AS n_view
FROM events GROUP BY 1 ORDER BY 1
""",
        # ordered funnel: earliest-completion chain, strict ts ordering
        "events_funnel": """
WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1)
SELECT 1::BIGINT AS step, 'view' AS event_type, count(*)::BIGINT AS n_users FROM s1
UNION ALL
SELECT 2, 'click', count(*) FROM s2
UNION ALL
SELECT 3, 'purchase', count(*) FROM s3
ORDER BY step
""",
        # per-user running total, accumulation order pinned (ts, event_id)
        "events_running": """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) * 100)::BIGINT
         AS running_x100
FROM events ORDER BY event_id
""",
        # per-user 3-row moving sum; inputs cents-quantized half-up so
        # the frame sums are exact integers on both engines
        "events_moving": """
SELECT event_id, user_id,
       sum(floor(value * 100 + 0.5)::BIGINT)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)::BIGINT
         AS moving_x100
FROM events ORDER BY event_id
""",
        # per-user LAG delta, cents-exact, first row per user omitted
        "events_delta": """
WITH q AS (SELECT event_id, user_id,
                  floor(value * 100 + 0.5)::BIGINT AS c,
                  lag(floor(value * 100 + 0.5)::BIGINT)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p
           FROM events)
SELECT event_id, user_id, (c - p)::BIGINT AS delta_x100
FROM q WHERE p IS NOT NULL ORDER BY event_id
""",
        # approximate quantiles from the SAME integer-exact histogram
        # sketch the engine computes (positive-operand ceil divisions
        # only: DuckDB // truncates toward zero, numpy floors)
        "events_quantiles_sketch": """
WITH cents AS (SELECT event_type, floor(value * 100 + 0.5)::BIGINT AS c
               FROM events),
b AS (SELECT event_type, min(c) AS cmin, max(c) AS cmax, count(*) AS n
      FROM cents GROUP BY 1),
w AS (SELECT event_type, cmin, cmax, n,
             greatest(1, (cmax - cmin + 1 + 255) // 256) AS width FROM b),
bk AS (SELECT c.event_type, (c.c - w.cmin) // w.width AS bucket,
              count(*) AS cnt
       FROM cents c JOIN w ON c.event_type = w.event_type GROUP BY 1, 2),
cum AS (SELECT event_type, bucket,
               sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum
        FROM bk),
qs(q_permille) AS (VALUES (500), (950)),
tgt AS (SELECT w.event_type, q.q_permille,
               (q.q_permille * w.n + 999) // 1000 AS target,
               w.cmin, w.cmax, w.width
        FROM w CROSS JOIN qs q)
SELECT t.event_type, t.q_permille::BIGINT AS q_permille,
       least(t.cmin + (min(c.bucket) + 1) * t.width - 1, t.cmax)::BIGINT
         AS approx_x100
FROM tgt t JOIN cum c ON c.event_type = t.event_type AND c.cum >= t.target
GROUP BY 1, 2, t.cmin, t.width, t.cmax
""",
        # interval (range) join: click-only sessions' [min ts, max ts]
        # intervals, then every same-user event inside an interval
        "events_in_sessions": """
WITH o AS (SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events WHERE event_type = 'click'),
m AS (SELECT user_id, ts, event_id,
        CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS new_sess FROM o),
s AS (SELECT user_id, ts,
        sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sess
      FROM m),
iv AS (SELECT user_id, min(ts) AS lo, max(ts) AS hi
       FROM s GROUP BY user_id, sess)
SELECT e.event_id, e.user_id, iv.lo AS session_start
FROM events e JOIN iv ON e.user_id = iv.user_id
                     AND e.ts >= iv.lo AND e.ts <= iv.hi
""",
        "events_sessions": """
WITH o AS (SELECT user_id, ts, event_id, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
m AS (SELECT user_id, ts, event_id, value,
        CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS new_sess FROM o),
s AS (SELECT user_id, ts, value,
        sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sess
      FROM m)
SELECT user_id, min(ts) AS session_start, count(*)::BIGINT AS n_events,
       CAST(round(sum(value) * 100, 0) AS BIGINT) AS sum_value_x100
FROM s GROUP BY user_id, sess
""",
        "events_distinct_users": """
SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
FROM events GROUP BY event_type
""",
        "events_quantiles": """
SELECT event_type, count(*)::BIGINT AS n,
       quantile_disc(value, 0.5)::DOUBLE AS p50,
       quantile_disc(value, 0.95)::DOUBLE AS p95
FROM events GROUP BY event_type
""",
        "events_asof_error": """
SELECT e.event_id, e.user_id, e.ts, err.ts AS last_error_ts
FROM events e
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'error') err
  ON e.user_id = err.user_id AND e.ts > err.ts
""",
        "top_terms_per_lang": f"""
WITH d AS (SELECT DISTINCT doc_id, lang, unnest({_TOKS}) AS term FROM documents),
c AS (SELECT lang, term, count(*)::BIGINT AS df FROM d GROUP BY 1, 2),
r AS (SELECT lang, term, df,
             row_number() OVER (PARTITION BY lang
                                ORDER BY df DESC, term ASC) AS rank
      FROM c)
SELECT lang, term, df, rank::INT AS rank FROM r WHERE rank <= 5
""",
        "term_df": f"""
SELECT term, count(*)::BIGINT AS df
FROM (SELECT DISTINCT doc_id, unnest({_TOKS}) AS term FROM documents)
GROUP BY term
""",
        "doc_token_counts": f"""
SELECT doc_id, len({_TOKS})::BIGINT AS n_tokens FROM documents
""",
        "corpus_stats": f"""
SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS total_len,
       round(sum(dl)::DOUBLE / count(*), 6) AS avgdl
FROM (SELECT len({_TOKS}) AS dl FROM documents)
""",
        # one-row corpus report card: every number exact; median pinned
        # to quantile_disc; dup groups = text groups of size > 1
        "corpus_report": f"""
SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
       (SELECT count(DISTINCT lang) FROM documents)::BIGINT AS n_langs,
       (SELECT sum(len({_TOKS})) FROM documents)::BIGINT AS total_tokens,
       (SELECT count(DISTINCT t)
        FROM (SELECT unnest({_TOKS}) AS t FROM documents))::BIGINT
           AS distinct_terms,
       (SELECT count(*) FROM (SELECT text, count(*) AS c FROM documents
                              GROUP BY text) WHERE c > 1)::BIGINT
           AS dup_sha_groups,
       (SELECT quantile_disc(length(text), 0.5) FROM documents)::BIGINT
           AS median_chars
""",
        "top_terms": f"""
SELECT term, df FROM (
  SELECT term, count(*)::BIGINT AS df,
         row_number() OVER (ORDER BY count(*) DESC, term ASC) AS rn
  FROM (SELECT DISTINCT doc_id, unnest({_TOKS}) AS term FROM documents)
  GROUP BY term)
WHERE rn <= 20
""",
        # heavy hitters: top by total OCCURRENCES (not df) — the engine
        # side goes through the MG sketch + certified exact recount
        "heavy_hitters": f"""
SELECT term, n FROM (
  SELECT term, count(*)::BIGINT AS n,
         row_number() OVER (ORDER BY count(*) DESC, term ASC) AS rn
  FROM (SELECT unnest({_TOKS}) AS term FROM documents)
  GROUP BY term)
WHERE rn <= 15
""",
        "content_sha256": """
SELECT doc_id, sha256(text) AS content_sha256 FROM documents
""",
        # generated from api.PINNED_REGEXES (RE2 on both sides: Arrow's
        # count_substring_regex and DuckDB's regexp_extract_all agree on
        # non-overlapping leftmost match counts)
        # indexed substring grep: non-overlapping count via the replace()
        # length trick (same semantics as Arrow count_substring)
        "substring_search": (
            "WITH p(pattern_id, pat) AS (VALUES "
            + ",".join(f"({pid},'{pat}')" for pid, pat in api.PINNED_SUBSTRINGS)
            + """),
m AS (SELECT p.pattern_id, d.doc_id,
             ((len(lower(d.text)) - len(replace(lower(d.text), p.pat, '')))
              / len(p.pat))::BIGINT AS n_hits
      FROM documents d CROSS JOIN p)
SELECT pattern_id::BIGINT AS pattern_id, doc_id, n_hits
FROM m WHERE n_hits > 0
"""
        ),
        # indexed regex grep: identical verification semantics to
        # regex_search (RE2 non-overlapping), different pattern set
        "grep_indexed": (
            "WITH p(pattern_id, pat) AS (VALUES "
            + ",".join(f"({pid},'{pat}')" for pid, pat in api.PINNED_GREP)
            + """),
m AS (SELECT pattern_id, doc_id,
             len(regexp_extract_all(text, pat))::BIGINT AS n_matches
      FROM documents CROSS JOIN p)
SELECT pattern_id::BIGINT AS pattern_id, doc_id, n_matches
FROM m WHERE n_matches > 0
"""
        ),
        "regex_search": (
            "WITH p(pattern_id, pat) AS (VALUES "
            + ",".join(f"({pid},'{pat}')" for pid, pat in api.PINNED_REGEXES)
            + """),
m AS (SELECT pattern_id, doc_id,
             len(regexp_extract_all(text, pat))::BIGINT AS n_matches
      FROM documents CROSS JOIN p)
SELECT pattern_id::BIGINT AS pattern_id, doc_id, n_matches
FROM m WHERE n_matches > 0
"""
        ),
        "cooccurrence": f"""
WITH dd AS (SELECT DISTINCT doc_id, unnest({_TOKS}) AS term FROM documents),
pr AS (SELECT a.term AS term_a, b.term AS term_b, count(*)::BIGINT AS n
       FROM dd a JOIN dd b ON a.doc_id = b.doc_id AND a.term < b.term
       GROUP BY 1, 2),
r AS (SELECT term_a, term_b, n,
             row_number() OVER (ORDER BY n DESC, term_a, term_b) AS rn
      FROM pr)
SELECT term_a, term_b, n FROM r WHERE rn <= 20
""",
        # recomputed from the raw table; the engine answers from the
        # index artifact (end-to-end build parity check)
        "index_stats": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dt AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM tok)
SELECT (SELECT count(*) FROM tok)::BIGINT AS n_docs,
       count(DISTINCT term)::BIGINT AS n_terms,
       count(*)::BIGINT AS n_postings,
       (SELECT sum(len(toks)) FROM tok)::BIGINT AS total_tokens
FROM dt
""",
        # generated from api.PINNED_SUGGEST; ranked by global df desc,
        # term asc (the engine serves df from the sharded dictionary)
        "suggest": f"""
WITH dt AS (SELECT DISTINCT doc_id, unnest({_TOKS}) AS term FROM documents),
df AS (SELECT term, count(*)::BIGINT AS df FROM dt GROUP BY 1),
p(prefix_id, prefix) AS (VALUES (0,'s'),(1,'c'),(2,'qu'),(3,'zz'),(4,'b')),
r AS (SELECT p.prefix_id::BIGINT AS prefix_id, df.term, df.df,
             row_number() OVER (PARTITION BY p.prefix_id
                                ORDER BY df.df DESC, df.term) AS srank
      FROM p JOIN df ON df.term LIKE p.prefix || '%')
SELECT prefix_id, term, df, srank::INT AS srank FROM r WHERE srank <= 5
""",
        "top_bigrams": f"""
WITH tok AS (SELECT {_TOKS} AS toks FROM documents),
bg AS (SELECT unnest(list_transform(range(1, len(toks)),
                                    i -> toks[i] || ' ' || toks[i+1])) AS bigram
       FROM tok),
c AS (SELECT bigram, count(*)::BIGINT AS n FROM bg GROUP BY 1),
r AS (SELECT bigram, n,
             row_number() OVER (ORDER BY n DESC, bigram ASC) AS rn FROM c)
SELECT bigram, n FROM r WHERE rn <= 20
""",
        # per-lang deterministic sample: splitmix64(doc_id) ascending,
        # doc_id tie-break, 10 per lang (same limb chain as sample_docs)
        "stratified_sample": f"""
WITH s0 AS (SELECT doc_id, lang,
        ((doc_id::HUGEINT + 11400714819323198485) % {_M64})::UBIGINT AS z
        FROM documents),
s1 AS (SELECT doc_id, lang, xor(z, z >> 30)::HUGEINT AS z FROM s0),
s2 AS (SELECT doc_id, lang, {_mul64('z', '13787848793156543929')}::UBIGINT AS z FROM s1),
s3 AS (SELECT doc_id, lang, xor(z, z >> 27)::HUGEINT AS z FROM s2),
s4 AS (SELECT doc_id, lang, {_mul64('z', '10723151780598845931')}::UBIGINT AS z FROM s3),
s5 AS (SELECT doc_id, lang, xor(z, z >> 31) AS z FROM s4),
r AS (SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang ORDER BY z, doc_id)
               AS sample_rank
      FROM s5)
SELECT lang, doc_id, sample_rank::INT AS sample_rank
FROM r WHERE sample_rank <= 10
""",
        # splitmix64(doc_id) % 8 == 0 — the engine's deterministic-sample
        # mix, spelled out in SQL: 64-bit multiply = 32-bit limb products
        # mod 2^64 in HUGEINT (DuckDB UBIGINT arithmetic errors on
        # overflow instead of wrapping)
        "sample_docs": f"""
WITH s0 AS (SELECT doc_id, text,
        ((doc_id::HUGEINT + 11400714819323198485) % {_M64})::UBIGINT AS z
        FROM documents),
s1 AS (SELECT doc_id, text, xor(z, z >> 30)::HUGEINT AS z FROM s0),
s2 AS (SELECT doc_id, text, {_mul64('z', '13787848793156543929')}::UBIGINT AS z FROM s1),
s3 AS (SELECT doc_id, text, xor(z, z >> 27)::HUGEINT AS z FROM s2),
s4 AS (SELECT doc_id, text, {_mul64('z', '10723151780598845931')}::UBIGINT AS z FROM s3),
s5 AS (SELECT doc_id, text, xor(z, z >> 31) AS z FROM s4)
SELECT doc_id, text FROM s5 WHERE z % 8 = 0
""",
        # token-budget shard packing: sequential fill in doc_id order,
        # shard = floor(cumsum_before(n_tokens) / budget)
        "pack_shards": f"""
WITH t AS (SELECT doc_id, len({_TOKS})::BIGINT AS n_tokens FROM documents)
SELECT doc_id, n_tokens,
  ((sum(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    - n_tokens) // 2000)::BIGINT AS shard
FROM t
""",
        # deterministic per-epoch global shuffle: rank = position in
        # (splitmix64(doc_id XOR splitmix64(epoch)), doc_id) order —
        # the engine's key chain recomputed over every doc
        "epoch_shuffle": f"""
WITH {_smix('h', 'documents', 'doc_id', _EPOCH_INEXPR)}
SELECT doc_id,
       (row_number() OVER (ORDER BY z, doc_id) - 1)::BIGINT AS epoch_rank
FROM h5
""",
        # corpus mixing: per-language permille keep rates, splitmix64 gate
        "mix_sample": f"""
WITH s0 AS (SELECT doc_id, lang, text,
        ((doc_id::HUGEINT + 11400714819323198485) % {_M64})::UBIGINT AS z
        FROM documents),
s1 AS (SELECT doc_id, lang, text, xor(z, z >> 30)::HUGEINT AS z FROM s0),
s2 AS (SELECT doc_id, lang, text, {_mul64('z', '13787848793156543929')}::UBIGINT AS z FROM s1),
s3 AS (SELECT doc_id, lang, text, xor(z, z >> 27)::HUGEINT AS z FROM s2),
s4 AS (SELECT doc_id, lang, text, {_mul64('z', '10723151780598845931')}::UBIGINT AS z FROM s3),
s5 AS (SELECT doc_id, lang, text, xor(z, z >> 31) AS z FROM s4),
rates(lang, r) AS (VALUES ('en', 1000), ('de', 500), ('es', 250),
                          ('fr', 125), ('zh', 0))
SELECT s5.doc_id, s5.lang, s5.text
FROM s5 JOIN rates USING (lang) WHERE z % 1000 < r
""",
        # exact-proportion stratified 80/10/10 split: per-lang rank by
        # (splitmix64(doc_id), doc_id), integer cut tests r*1000 < n*cut
        "stratified_split": f"""
WITH s0 AS (SELECT doc_id, lang,
        ((doc_id::HUGEINT + 11400714819323198485) % {_M64})::UBIGINT AS z
        FROM documents),
s1 AS (SELECT doc_id, lang, xor(z, z >> 30)::HUGEINT AS z FROM s0),
s2 AS (SELECT doc_id, lang, {_mul64('z', '13787848793156543929')}::UBIGINT AS z FROM s1),
s3 AS (SELECT doc_id, lang, xor(z, z >> 27)::HUGEINT AS z FROM s2),
s4 AS (SELECT doc_id, lang, {_mul64('z', '10723151780598845931')}::UBIGINT AS z FROM s3),
s5 AS (SELECT doc_id, lang, xor(z, z >> 31) AS z FROM s4),
r AS (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY z, doc_id) - 1
               AS r,
             count(*) OVER (PARTITION BY lang) AS n
      FROM s5)
SELECT doc_id, lang,
       CASE WHEN r * 1000 < n * 800 THEN 'train'
            WHEN r * 1000 < n * 900 THEN 'val'
            ELSE 'test' END AS split
FROM r
""",
        # group-aware split: all of a source's docs share one split
        # (sha256-top64 of the source key mod 100 vs the 80/90 cuts)
        "grouped_split": f"""
WITH h AS (SELECT doc_id, source, ({_HEX64}) % 100 AS hm
           FROM (SELECT doc_id, source, source AS s FROM documents))
SELECT doc_id, source,
       CASE WHEN hm < 80 THEN 'train'
            WHEN hm < 90 THEN 'val'
            ELSE 'test' END AS split
FROM h
""",
        # Efraimidis-Spirakis weighted sample without replacement:
        # u = (splitmix64(id)+1)/2^64, integer exponential key
        # (floor(-ln(u)*1e6 + 0.5) * 1e6) // weight, k=50 smallest
        "weighted_sample": f"""
WITH s0 AS (SELECT doc_id, n_chars,
        ((doc_id::HUGEINT + 11400714819323198485) % {_M64})::UBIGINT AS z
        FROM documents),
s1 AS (SELECT doc_id, n_chars, xor(z, z >> 30)::HUGEINT AS z FROM s0),
s2 AS (SELECT doc_id, n_chars, {_mul64('z', '13787848793156543929')}::UBIGINT AS z FROM s1),
s3 AS (SELECT doc_id, n_chars, xor(z, z >> 27)::HUGEINT AS z FROM s2),
s4 AS (SELECT doc_id, n_chars, {_mul64('z', '10723151780598845931')}::UBIGINT AS z FROM s3),
s5 AS (SELECT doc_id, n_chars, xor(z, z >> 31) AS z FROM s4),
e AS (SELECT doc_id, n_chars::BIGINT AS n_chars,
             (CAST(floor(-ln((z::DOUBLE + 1) / 18446744073709551616.0)
                         * 1000000 + 0.5) AS BIGINT) * 1000000)
               // n_chars::BIGINT AS ekey
      FROM s5 WHERE n_chars > 0)
SELECT doc_id, n_chars, ekey FROM e ORDER BY ekey, doc_id LIMIT 50
""",
        # rolling polynomial hash over per-token sha256-top-8-byte hashes
        # mod 2^61-1 (functions.textstats.fingerprint, pinned): Horner as
        # a recursive CTE over token position
        "doc_fingerprints": f"""
WITH RECURSIVE tok AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents),
hs AS (SELECT doc_id,
        list_transform(toks, s -> ({_HEX64} % 2305843009213693951)::HUGEINT) AS th,
        len(toks) AS n FROM tok),
rec AS (
  SELECT doc_id, 0::HUGEINT AS h, 0 AS i, th, n FROM hs
  UNION ALL
  SELECT doc_id, (h * 1000003 + th[i+1]) % 2305843009213693951::HUGEINT,
         i + 1, th, n
  FROM rec WHERE i < n)
SELECT doc_id, h::UBIGINT AS fingerprint FROM rec WHERE i = n
""",
        "filter_project": """
SELECT doc_id, source, n_chars FROM documents WHERE lang = 'en'
""",
        "exact_dedup": """
SELECT sha256(text) AS content_sha256, min(doc_id)::BIGINT AS doc_id,
       count(*)::BIGINT AS n_dups
FROM documents GROUP BY 1
""",
        # decontamination: corpus docs sharing any token 4-gram with the
        # benchmark side (doc_id % 64 == 0), count of DISTINCT shared grams
        # bigram-LM perplexity: vocab = top-N terms (count desc, term asc),
        # OOV -> '<unk>', add-one smoothing over bigram prefix counts,
        # per-doc cross-entropy quantized x1000 (same spec as pipelines/lm.py)
        "perplexity": _PERPLEXITY_SQL,
        # CCNet head/middle/tail buckets: the perplexity chain ranked
        # per lang by (ce_x1000, doc_id), exact integer tertile cuts
        # ((rank-1)*3)//n (pipelines/lm.ccnet_buckets)
        "ccnet_buckets": f"""
WITH ppl AS MATERIALIZED ({_PERPLEXITY_SQL}),
ccj AS (SELECT p.doc_id, d.lang, p.ce_x1000
        FROM ppl p JOIN documents d USING (doc_id)),
ccr AS (SELECT doc_id, lang, ce_x1000,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY ce_x1000, doc_id) - 1 AS rn,
               count(*) OVER (PARTITION BY lang) AS n
        FROM ccj)
SELECT doc_id, lang, ce_x1000,
       CASE (rn * 3) // n WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM ccr
""",
        "winnow_fingerprints": f"""
WITH {_WINNOW_CTE}
SELECT doc_id, pos, fingerprint FROM fps
""",
        "winnow_matches": f"""
WITH {_WINNOW_CTE},
fd AS (SELECT DISTINCT doc_id, fingerprint FROM fps),
ok AS (SELECT fingerprint FROM fd GROUP BY 1
       HAVING count(*) BETWEEN 2 AND 50)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       count(*)::BIGINT AS n_shared
FROM fd a JOIN fd b ON a.fingerprint = b.fingerprint
                   AND a.doc_id < b.doc_id
JOIN ok ON ok.fingerprint = a.fingerprint
GROUP BY 1, 2 HAVING count(*) >= 2
""",
        # top-20 PMI collocations (Church & Hanks): min bigram count 5,
        # pmi = ln(n_ab*T^2 / (B*n_a*n_b)) quantized half-away to x1e6;
        # float assembly order mirrors the numpy side exactly
        "pmi_collocations": f"""
WITH tokl AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
tokp AS (SELECT doc_id, i, toks[i] AS w,
                CASE WHEN i < len(toks) THEN toks[i + 1] END AS wn
         FROM tokl, unnest(generate_series(1, len(toks))) AS t(i)),
uni AS (SELECT w, count(*)::BIGINT AS n_w FROM tokp GROUP BY 1),
bi AS (SELECT w AS wa, wn AS wb, count(*)::BIGINT AS n_ab
       FROM tokp WHERE wn IS NOT NULL GROUP BY 1, 2
       HAVING count(*) >= 5),
tb AS (SELECT sum(n_w)::BIGINT AS t,
              (SELECT count(*) FROM tokp WHERE wn IS NOT NULL)::BIGINT AS b
       FROM uni)
SELECT bi.wa || ' ' || bi.wb AS bigram, bi.n_ab,
       CAST(floor(ln((bi.n_ab::DOUBLE * tb.t * tb.t)
                     / (tb.b::DOUBLE * ua.n_w * ub.n_w)) * 1000000
                  + 0.5) AS BIGINT) AS pmi_x1e6
FROM bi JOIN uni ua ON ua.w = bi.wa JOIN uni ub ON ub.w = bi.wb, tb
ORDER BY pmi_x1e6 DESC, bigram LIMIT 20
""",
        # top-5 tf-idf keywords per doc; idf quantized half-away to x1e6
        # BIGINT so the score (tf * idf_x1e6) hash-compares exactly
        "tfidf_keywords": f"""
WITH tokp AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tokp GROUP BY 1, 2),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
nn AS (SELECT count(*)::BIGINT AS n FROM documents),
sc AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
              tf.tf * CAST(floor(ln((nn.n + 1.0) / (df.df + 1.0)) * 1000000
                                 + 0.5) AS BIGINT) AS score_x1e6
       FROM tf JOIN df USING (term), nn),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score_x1e6 DESC, term) AS rnk
      FROM sc)
SELECT doc_id, term, tf, df, score_x1e6, rnk::BIGINT AS rnk
FROM r WHERE rnk <= 5
""",
        # apply step of exact-substring dedup: drop every token covered by
        # a cross-doc duplicated 8-gram window; cleaned = surviving token
        # stream joined by ' ' (token-level removal, pinned in spans.py)
        "remove_dup_spans": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
w AS (SELECT doc_id, toks FROM tok WHERE len(toks) >= 8),
g AS (SELECT doc_id, (i-1)::BIGINT AS pos,
             array_to_string(toks[i:i+7], ' ') AS gram
      FROM w, unnest(generate_series(1, len(toks)-7)) AS t(i)),
dup AS (SELECT gram FROM g GROUP BY 1
        HAVING count(DISTINCT doc_id) >= 2),
dstart AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
cov AS (SELECT DISTINCT d.doc_id, s.p
        FROM dstart d, unnest(generate_series(d.pos, d.pos + 7)) AS s(p)),
tp AS (SELECT doc_id, (i-1)::BIGINT AS p, toks[i] AS tokn
       FROM tok, unnest(generate_series(1, len(toks))) AS t(i)),
kept AS (SELECT t.doc_id, t.p, t.tokn FROM tp t
         LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.p = t.p
         WHERE c.p IS NULL),
agg AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
               string_agg(tokn, ' ' ORDER BY p) AS cleaned
        FROM kept GROUP BY 1)
SELECT tok.doc_id, len(tok.toks)::BIGINT AS n_tokens,
       (len(tok.toks) - coalesce(a.n_kept, 0))::BIGINT AS n_removed,
       coalesce(a.cleaned, '') AS cleaned
FROM tok LEFT JOIN agg a ON a.doc_id = tok.doc_id
""",
        # cross-doc duplicated token-8-gram spans: a window is duplicated
        # when its gram occurs in >= 2 DISTINCT docs; every position of a
        # duplicated gram counts (pipelines/spans.py pinned spec)
        "dup_spans": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
w AS (SELECT doc_id, (len(toks) - 7)::BIGINT AS n_windows, toks
      FROM tok WHERE len(toks) >= 8),
g AS (SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS gram
      FROM w, unnest(generate_series(1, len(toks)-7)) AS t(i)),
gp AS (SELECT doc_id, gram, count(*) AS n_pos FROM g GROUP BY 1, 2),
dup AS (SELECT gram FROM gp GROUP BY gram
        HAVING count(DISTINCT doc_id) >= 2),
dc AS (SELECT doc_id, sum(n_pos) AS n_dup FROM gp
       JOIN dup USING (gram) GROUP BY 1)
SELECT w.doc_id, w.n_windows,
       coalesce(dc.n_dup, 0)::BIGINT AS n_dup_windows
FROM w LEFT JOIN dc ON dc.doc_id = w.doc_id
""",
        "decontaminate": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
bg AS (SELECT DISTINCT array_to_string(toks[i:i+3], ' ') AS gram
       FROM tok, unnest(generate_series(1, len(toks)-3)) AS t(i)
       WHERE doc_id % 64 = 0),
cg AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+3], ' ') AS gram
       FROM tok, unnest(generate_series(1, len(toks)-3)) AS t(i)
       WHERE doc_id % 64 <> 0)
SELECT doc_id, count(*)::BIGINT AS n_bench_grams
FROM cg JOIN bg USING (gram) GROUP BY 1 ORDER BY 1
""",
        "ngram_jaccard": f"""
WITH sh AS (SELECT DISTINCT doc_id, unnest({_TOKS}) AS s FROM documents),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT da AS doc_a, db AS doc_b,
       round(c::DOUBLE / (x.n + y.n - c), 6) AS jaccard
FROM inter JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
WHERE c::DOUBLE / (x.n + y.n - c) >= 0.5
""",
        # MinHash+LSH near-dup pairs, the FULL engine chain recomputed in
        # SQL (pipelines/dedup.minhash_neardup_pairs): sha256-top64 token
        # hashes -> FNV-combined 3-gram windows -> splitmix-finalized
        # shingle hashes -> 128 splitmix-derived universal-hash perms mod
        # 2^31-1 -> per-perm min signature -> 32x4 FNV-banded splitmix keys
        # -> pairs sharing any band key -> exact shingle-Jaccard >= 0.5
        "minhash_neardup": f"""
WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             FROM documents),
tu AS (SELECT doc_id, i, toks[i] AS s
       FROM tok, unnest(generate_series(1, len(toks))) AS t(i)),
th AS (SELECT doc_id, i, ({_HEX64})::HUGEINT AS h FROM tu),
w0 AS (SELECT a.doc_id, ({_mul64('a.h', _FNV)} + b.h) % {_M64} AS acc, c.h AS h2
       FROM th a JOIN th b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                 JOIN th c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
w1 AS (SELECT doc_id, ({_mul64('acc', _FNV)} + h2) % {_M64} AS v FROM w0),
{_smix('g', 'w1', 'doc_id', 'v')},
sh AS (SELECT DISTINCT doc_id, z AS s FROM g5),
szh AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
pi AS (SELECT unnest(generate_series(0, 127))::HUGEINT AS i),
{_smix('pa', 'pi', 'i', '2*i + 1')},
{_smix('pb', 'pi', 'i', '2*i + 2')},
perm AS (SELECT pa5.i AS p, (pa5.z % 2147483646)::HUGEINT + 1 AS a,
                (pb5.z % 2147483647)::HUGEINT AS b
         FROM pa5 JOIN pb5 ON pa5.i = pb5.i),
xs AS (SELECT doc_id, (s % 2147483647)::HUGEINT AS x FROM sh),
sig AS (SELECT doc_id, p, min((a * x + b) % 2147483647) AS sv
        FROM xs CROSS JOIN perm GROUP BY 1, 2),
sigl AS (SELECT doc_id, p // 4 AS band_i, list(sv ORDER BY p) AS svs
         FROM sig GROUP BY 1, 2),
b0 AS (SELECT doc_id, band_i, svs[3] AS s2, svs[4] AS s3,
              ({_mul64('svs[1]', _FNV)} + svs[2]) % {_M64} AS acc FROM sigl),
b1 AS (SELECT doc_id, band_i, s3,
              ({_mul64('acc', _FNV)} + s2) % {_M64} AS acc FROM b0),
b2 AS (SELECT doc_id, band_i,
              ({_mul64('acc', _FNV)} + s3) % {_M64} AS acc FROM b1),
bx AS (SELECT doc_id, band_i,
              xor(acc::UBIGINT,
                  ({_mul64('band_i::HUGEINT', '11400714819323198485')})::UBIGINT
                  )::HUGEINT AS v FROM b2),
{_smix('k', 'bx', 'doc_id, band_i', 'v')},
cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         FROM k5 x JOIN k5 y ON x.z = y.z AND x.doc_id < y.doc_id),
iv AS (SELECT c.a, c.b, count(*) AS c
       FROM cand c JOIN sh p ON p.doc_id = c.a
                   JOIN sh q ON q.doc_id = c.b AND q.s = p.s
       GROUP BY 1, 2)
SELECT iv.a AS doc_a, iv.b AS doc_b,
       round(iv.c::DOUBLE / (x.n + y.n - iv.c), 6) AS jaccard
FROM iv JOIN szh x ON x.doc_id = iv.a JOIN szh y ON y.doc_id = iv.b
WHERE iv.c::DOUBLE / (x.n + y.n - iv.c) >= 0.5
""",
        # incremental MinHash: the SAME full signature/band chain, but
        # candidates restricted to CROSS pairs between the corpus side
        # (doc_id % 8 <> 7, the persisted band artifact) and the delta
        # shard (doc_id % 8 = 7) — a = corpus doc, b = delta doc
        "minhash_neardup_delta": f"""
WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
             FROM documents),
tu AS (SELECT doc_id, i, toks[i] AS s
       FROM tok, unnest(generate_series(1, len(toks))) AS t(i)),
th AS (SELECT doc_id, i, ({_HEX64})::HUGEINT AS h FROM tu),
w0 AS (SELECT a.doc_id, ({_mul64('a.h', _FNV)} + b.h) % {_M64} AS acc, c.h AS h2
       FROM th a JOIN th b ON b.doc_id = a.doc_id AND b.i = a.i + 1
                 JOIN th c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
w1 AS (SELECT doc_id, ({_mul64('acc', _FNV)} + h2) % {_M64} AS v FROM w0),
{_smix('g', 'w1', 'doc_id', 'v')},
sh AS (SELECT DISTINCT doc_id, z AS s FROM g5),
szh AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
pi AS (SELECT unnest(generate_series(0, 127))::HUGEINT AS i),
{_smix('pa', 'pi', 'i', '2*i + 1')},
{_smix('pb', 'pi', 'i', '2*i + 2')},
perm AS (SELECT pa5.i AS p, (pa5.z % 2147483646)::HUGEINT + 1 AS a,
                (pb5.z % 2147483647)::HUGEINT AS b
         FROM pa5 JOIN pb5 ON pa5.i = pb5.i),
xs AS (SELECT doc_id, (s % 2147483647)::HUGEINT AS x FROM sh),
sig AS (SELECT doc_id, p, min((a * x + b) % 2147483647) AS sv
        FROM xs CROSS JOIN perm GROUP BY 1, 2),
sigl AS (SELECT doc_id, p // 4 AS band_i, list(sv ORDER BY p) AS svs
         FROM sig GROUP BY 1, 2),
b0 AS (SELECT doc_id, band_i, svs[3] AS s2, svs[4] AS s3,
              ({_mul64('svs[1]', _FNV)} + svs[2]) % {_M64} AS acc FROM sigl),
b1 AS (SELECT doc_id, band_i, s3,
              ({_mul64('acc', _FNV)} + s2) % {_M64} AS acc FROM b0),
b2 AS (SELECT doc_id, band_i,
              ({_mul64('acc', _FNV)} + s3) % {_M64} AS acc FROM b1),
bx AS (SELECT doc_id, band_i,
              xor(acc::UBIGINT,
                  ({_mul64('band_i::HUGEINT', '11400714819323198485')})::UBIGINT
                  )::HUGEINT AS v FROM b2),
{_smix('k', 'bx', 'doc_id, band_i', 'v')},
cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         FROM k5 x JOIN k5 y ON x.z = y.z
         WHERE x.doc_id % 8 <> 7 AND y.doc_id % 8 = 7),
iv AS (SELECT c.a, c.b, count(*) AS c
       FROM cand c JOIN sh p ON p.doc_id = c.a
                   JOIN sh q ON q.doc_id = c.b AND q.s = p.s
       GROUP BY 1, 2)
SELECT iv.a AS doc_a, iv.b AS doc_b,
       round(iv.c::DOUBLE / (x.n + y.n - iv.c), 6) AS jaccard
FROM iv JOIN szh x ON x.doc_id = iv.a JOIN szh y ON y.doc_id = iv.b
WHERE iv.c::DOUBLE / (x.n + y.n - iv.c) >= 0.5
""",
        # HyperLogLog p=12 approximate distinct users per event type —
        # the IDENTICAL sketch recomputed in SQL (functions/sketch.py
        # hll_partial/hll_estimate): splitmix64 value hash, register =
        # top-12 bits, rank = leading zeros of (h<<12 | 0xFFF) + 1 via
        # bin() length, exact HUGEINT harmonic sum S = sum 2^(64-r),
        # pinned float assembly alpha*m*m*2^64 / S, linear counting for
        # the small range
        "events_distinct_approx": f"""
WITH va AS (SELECT event_type, user_id::HUGEINT AS u FROM events),
{_smix('h', 'va', 'event_type', 'u')},
rk AS (SELECT event_type, z >> 52 AS idx,
              65 - length(bin(((z::HUGEINT % 4503599627370496) * 4096
                               + 4095)::UBIGINT)) AS r
       FROM h5),
regs AS (SELECT event_type, idx, max(r) AS r FROM rk GROUP BY 1, 2),
agg AS (SELECT event_type, count(*) AS np,
               sum(4::HUGEINT * (1::UBIGINT << (62 - r))::HUGEINT) AS sp
        FROM regs GROUP BY 1),
fin AS (SELECT event_type, (4096 - np) AS zeros,
               ((4096 - np)::HUGEINT * 18446744073709551616::HUGEINT + sp)
                 AS s_scaled
        FROM agg),
est AS (SELECT event_type, zeros,
               ((0.7213 / (1.0 + 1.079 / 4096.0)) * 4096 * 4096
                * 18446744073709551616.0) / s_scaled::DOUBLE AS e
        FROM fin)
SELECT event_type,
       round(CASE WHEN e <= 10240.0 AND zeros > 0
                  THEN 4096.0 * ln(4096.0 / zeros) ELSE e END, 6)
         AS n_distinct_approx
FROM est
""",
        # per-lang integer-exact percentile rank of doc token counts
        # (((row_number-1) * 1e6) // (n-1), 0 for singleton groups)
        "doclen_percentiles": f"""
WITH tc AS (SELECT doc_id, lang, len({_TOKS})::BIGINT AS n FROM documents),
r AS (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY n, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS cnt
      FROM tc)
SELECT doc_id, lang,
       (((rn - 1) * 1000000) // greatest(cnt - 1, 1))::BIGINT AS pct_x1e6
FROM r
""",
        # triangle count over the J >= 0.95 pair graph; the engine's
        # degree orientation and the oracle's id orientation count the
        # same triangles (orientation-independent total)
        "dedup_triangles": f"""
WITH sh AS (SELECT DISTINCT doc_id, unnest({_TOKS}) AS s FROM documents),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
e AS (SELECT da, db
      FROM inter JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
      WHERE c::DOUBLE / (x.n + y.n - c) >= 0.95)
SELECT count(*)::BIGINT AS n_triangles
FROM e e1 JOIN e e2 ON e2.da = e1.da AND e2.db > e1.db
JOIN e e3 ON e3.da = e1.db AND e3.db = e2.db
""",
        # degree histogram over the same J>=0.95 pair graph
        "dedup_degree": f"""
WITH sh AS (SELECT DISTINCT doc_id, unnest({_TOKS}) AS s FROM documents),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
e AS (SELECT da, db
      FROM inter JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
      WHERE c::DOUBLE / (x.n + y.n - c) >= 0.95),
und AS (SELECT da AS node FROM e UNION ALL SELECT db FROM e),
deg AS (SELECT node, count(*)::BIGINT AS degree FROM und GROUP BY 1)
SELECT degree, count(*)::BIGINT AS n_nodes FROM deg GROUP BY 1
""",
        # expectation gate: per-rule violation counts over events
        "events_validate": """
SELECT 'value_nonnegative' AS rule,
       count(*) FILTER (WHERE value < 0)::BIGINT AS n_violations FROM events
UNION ALL
SELECT 'ts_not_null', count(*) FILTER (WHERE ts IS NULL)::BIGINT FROM events
UNION ALL
SELECT 'type_known',
       count(*) FILTER (WHERE event_type IS NULL OR event_type NOT IN
         ('view', 'click', 'purchase', 'error', 'signup'))::BIGINT FROM events
UNION ALL
SELECT 'event_id_unique',
       (count(*) - count(DISTINCT event_id))::BIGINT FROM events
""",
        # incremental dedup: cross pairs between the delta shard
        # (doc_id % 8 == 7) and the corpus behind the persisted artifact
        "ngram_jaccard_delta": f"""
WITH sh AS (SELECT DISTINCT doc_id, unnest({_TOKS}) AS s FROM documents),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s
          WHERE a.doc_id % 8 <> 7 AND b.doc_id % 8 = 7
          GROUP BY 1, 2)
SELECT da AS doc_a, db AS doc_b,
       round(c::DOUBLE / (x.n + y.n - c), 6) AS jaccard
FROM inter JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
WHERE c::DOUBLE / (x.n + y.n - c) >= 0.5
""",
        # connected components over the same pair graph: min-label via
        # transitive closure (propagation pruned to lab < target, which
        # preserves per-node minima: the component min reaches every
        # member along a simple path of strictly larger ids)
        "dedup_clusters": f"""
WITH RECURSIVE
{_CLUSTER_CTE}
SELECT node AS doc_id, cluster_id::BIGINT AS cluster_id,
       count(*) OVER (PARTITION BY cluster_id)::BIGINT AS cluster_size
FROM lab
""",
        # the corpus with every non-canonical cluster member removed
        "dedup_survivors": f"""
WITH RECURSIVE
{_CLUSTER_CTE},
sized AS (SELECT node AS doc_id, cluster_id FROM lab),
tokc AS (SELECT doc_id, len({_TOKS})::BIGINT AS n_tokens FROM documents),
r AS (SELECT s.cluster_id, s.doc_id,
             row_number() OVER (PARTITION BY s.cluster_id
                                ORDER BY t.n_tokens DESC, s.doc_id) AS rn
      FROM sized s JOIN tokc t ON t.doc_id = s.doc_id)
SELECT d.doc_id, d.lang, d.text
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM r WHERE rn > 1)
""",
        # full curation: survivors -> quality gate -> PII scrub
        "curate_corpus": fr"""
WITH RECURSIVE
{_CLUSTER_CTE},
sized AS (SELECT node AS doc_id, cluster_id FROM lab),
tokc AS (SELECT doc_id, len({_TOKS})::BIGINT AS n_tokens FROM documents),
r AS (SELECT s.cluster_id, s.doc_id,
             row_number() OVER (PARTITION BY s.cluster_id
                                ORDER BY t.n_tokens DESC, s.doc_id) AS rn
      FROM sized s JOIN tokc t ON t.doc_id = s.doc_id),
surv AS (SELECT d.doc_id, d.text FROM documents d
         WHERE d.doc_id NOT IN (SELECT doc_id FROM r WHERE rn > 1)),
t AS (SELECT doc_id, text, {_TOKS} AS toks FROM surv)
SELECT doc_id,
       regexp_replace(
         regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '[EMAIL]', 'g'),
         '[0-9]{{6,}}', '[NUM]', 'g') AS redacted
FROM t
WHERE len(toks) >= 5 AND
  round(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in')))::DOUBLE
        / len(toks), 6) <= 0.5
""",
        # canonical member per cluster: most tokens, then smallest doc_id
        "cluster_canonical": f"""
WITH RECURSIVE
{_CLUSTER_CTE},
sized AS (SELECT node AS doc_id, cluster_id,
                 count(*) OVER (PARTITION BY cluster_id) AS cluster_size
          FROM lab),
tokc AS (SELECT doc_id, len({_TOKS})::BIGINT AS n_tokens FROM documents),
r AS (SELECT s.cluster_id, s.doc_id, t.n_tokens, s.cluster_size,
             row_number() OVER (PARTITION BY s.cluster_id
                                ORDER BY t.n_tokens DESC, s.doc_id) AS rn
      FROM sized s JOIN tokc t ON t.doc_id = s.doc_id)
SELECT cluster_id::BIGINT AS cluster_id, doc_id AS canonical_doc_id,
       n_tokens, cluster_size::BIGINT AS cluster_size
FROM r WHERE rn = 1
""",
        # per-label mean embedding, unnested to (label, dim, v) rows
        "embedding_centroids": """
SELECT label::BIGINT AS label, i::BIGINT AS dim,
       round(avg(embedding[i]::DOUBLE), 6) AS v
FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
GROUP BY 1, 2 ORDER BY 1, 2
""",
        "ann_topk": """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (0,1,2,3,4)),
s AS (SELECT q.query_id, e.vec_id, list_cosine_similarity(e.v, q.qv) AS cs
      FROM q CROSS JOIN e),
r AS (SELECT query_id, vec_id, cs,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cs DESC, vec_id ASC) AS rank
      FROM s)
SELECT query_id, rank::INT AS rank, vec_id, round(cs, 6) AS cos_sim
FROM r WHERE rank <= 10
""",
        # donkey A6 analogue: feature-pair hits >= R grouped per
        # (query object, corpus object), object-level rerank
        "object_search": (
            "WITH q AS (SELECT label AS query_label, embedding::DOUBLE[] AS qv "
            "FROM embeddings WHERE label IN ("
            + ",".join(str(l) for l in api.OBJECT_QUERY_LABELS)
            + """)),
e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
hits AS (SELECT q.query_label, e.label,
                list_cosine_similarity(q.qv, e.v) AS sim
         FROM e CROSS JOIN q
         WHERE list_cosine_similarity(q.qv, e.v) >= """
            + str(api.OBJECT_R)
            + """),
agg AS (SELECT query_label, label, count(*)::BIGINT AS n_matches,
               max(sim) AS max_sim
        FROM hits GROUP BY query_label, label),
r AS (SELECT query_label, label, n_matches, max_sim,
             row_number() OVER (PARTITION BY query_label
                                ORDER BY n_matches DESC, max_sim DESC,
                                         label ASC) AS rank
      FROM agg)
SELECT query_label::BIGINT AS query_label, rank::INT AS rank,
       label::BIGINT AS label, n_matches, round(max_sim, 6) AS max_sim
FROM r WHERE rank <= """
            + str(api.OBJECT_K)
        ),
        # leave-one-out 5-NN label prediction: neighbor ties vec_id asc,
        # vote ties count desc then label asc
        "knn_label_eval": """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
s AS (SELECT a.vec_id AS qa, b.vec_id, b.label,
             list_cosine_similarity(a.v, b.v) AS cs
      FROM e a JOIN e b ON b.vec_id <> a.vec_id),
r AS (SELECT qa, vec_id, label,
             row_number() OVER (PARTITION BY qa
                                ORDER BY cs DESC, vec_id) AS rn
      FROM s),
v AS (SELECT qa, label, count(*) AS c FROM r WHERE rn <= 5 GROUP BY 1, 2),
p AS (SELECT qa, label AS pred_label,
             row_number() OVER (PARTITION BY qa
                                ORDER BY c DESC, label) AS pr
      FROM v)
SELECT e.vec_id, e.label::BIGINT AS true_label,
       p.pred_label::BIGINT AS pred_label,
       (e.label = p.pred_label)::BIGINT AS correct
FROM e JOIN p ON p.qa = e.vec_id AND p.pr = 1
""",
        # semantic dedup clusters: transitive closure over the SAME
        # cosine pair graph as embedding_neardup, min-label per node
        "embedding_clusters": f"""
WITH RECURSIVE
e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
pr AS (SELECT a.vec_id AS a, b.vec_id AS b
       FROM e0 a JOIN e0 b ON a.vec_id < b.vec_id
       WHERE list_cosine_similarity(a.v, b.v) >= {api.NEARDUP_COS_THRESHOLD}),
e AS (SELECT a, b FROM pr UNION SELECT b, a FROM pr),
walk(node, lab) AS (
    SELECT a, a FROM e
    UNION
    SELECT e.b, walk.lab FROM walk JOIN e ON e.a = walk.node
    WHERE walk.lab < e.b
),
lab AS (SELECT node, min(lab) AS cluster_id FROM walk GROUP BY 1)
SELECT node AS vec_id, cluster_id::BIGINT AS cluster_id,
       count(*) OVER (PARTITION BY cluster_id)::BIGINT AS cluster_size
FROM lab
""",
        "embedding_neardup": """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.35
""",
        # BPE-ish pretoken counts: same RE2 pattern, DuckDB side
        "bpe_token_counts": (
            """SELECT doc_id, len(regexp_extract_all(text, '"""
            + __import__("donkey_ray.pipelines.analyze", fromlist=["x"]).BPE_PRETOKEN_RE.replace("'", "''")
            + """'))::BIGINT AS n_pretokens FROM documents"""
        ),
        "quality_scores": f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
SELECT doc_id, len(toks)::BIGINT AS n_tokens,
  CASE WHEN len(toks) = 0 THEN 0.0 ELSE round(
    len(list_filter(toks, x -> x IN ('the','a','of','and','to','in')))::DOUBLE
    / len(toks), 6) END AS stopword_ratio,
  CASE WHEN len(toks) = 0 THEN 0.0 ELSE round(
    list_aggregate(list_transform(toks, x -> length(x)), 'sum')::DOUBLE
    / len(toks), 6) END AS mean_token_len
FROM t
""",
        # hybrid retrieval: BM25 more-like-this top-50 + cosine top-50,
        # Reciprocal Rank Fusion (k=60), final top-10 per query.
        # embeddings.vec_id is pinned as the embedding of doc_id.
        "hybrid_topk": f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl)::DOUBLE AS avgdl FROM dl),
qt AS (SELECT DISTINCT doc_id AS query_id, unnest(toks) AS term
       FROM tok WHERE doc_id IN (0, 7, 42)),
terms AS (SELECT doc_id, unnest(toks) AS term FROM tok),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM terms GROUP BY 1,2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
scores AS (
  SELECT qt.query_id, tf.doc_id,
    sum( ln((s.n_docs - df.df + 0.5)/(df.df + 0.5) + 1) *
         tf.tf*(1.2+1)/(tf.tf + 1.2*(1 - 0.75 + 0.75*dl.dl/s.avgdl)) ) AS score
  FROM qt JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1,2),
bm AS (SELECT query_id, doc_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc_id ASC) AS r
       FROM scores),
bmc AS (SELECT * FROM bm WHERE r <= 50),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (0, 7, 42)),
cs AS (SELECT q.query_id, e.vec_id AS doc_id,
              list_cosine_similarity(e.v, q.qv) AS sim
       FROM q CROSS JOIN e),
cr AS (SELECT query_id, doc_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, doc_id ASC) AS r
       FROM cs),
crc AS (SELECT * FROM cr WHERE r <= 50),
u AS (SELECT COALESCE(b.query_id, c.query_id) AS query_id,
             COALESCE(b.doc_id, c.doc_id) AS doc_id,
             COALESCE(1.0/(60 + b.r), 0) + COALESCE(1.0/(60 + c.r), 0) AS rrf
      FROM bmc b FULL OUTER JOIN crc c
        ON b.query_id = c.query_id AND b.doc_id = c.doc_id),
f AS (SELECT query_id, doc_id, rrf,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY rrf DESC, doc_id ASC) AS rank
      FROM u)
SELECT query_id::BIGINT AS query_id, rank::INT AS rank,
       doc_id::BIGINT AS doc_id, round(rrf, 6) AS rrf
FROM f WHERE rank <= 10
""",
        # within-doc duplicate-line removal, first occurrence kept
        "dedup_lines": """
WITH t AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
e AS (SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS ord FROM t),
p AS (SELECT doc_id, ord, ls[ord] AS line FROM e),
f AS (SELECT doc_id, ord, line,
             min(ord) OVER (PARTITION BY doc_id, line) AS first_ord FROM p)
SELECT doc_id, string_agg(line, chr(10) ORDER BY ord) AS cleaned
FROM f WHERE ord = first_ord GROUP BY doc_id
""",
        # corpus-level line dedup: a non-empty line survives only at its
        # corpus-wide first occurrence (min (doc_id, idx)); '' lines exempt
        "dedup_lines_global": """
WITH t AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
e AS (SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS ord FROM t),
p AS (SELECT doc_id, ord, ls[ord] AS line FROM e),
k AS (SELECT doc_id, ord, line,
             CASE WHEN line = '' THEN 1
                  ELSE row_number() OVER (PARTITION BY line
                                          ORDER BY doc_id, ord)
             END AS rn
      FROM p),
c AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
             string_agg(line, chr(10) ORDER BY ord) AS cleaned
      FROM k WHERE rn = 1 GROUP BY doc_id)
SELECT t.doc_id, len(t.ls)::BIGINT AS n_lines,
       coalesce(c.n_kept, 0)::BIGINT AS n_kept,
       coalesce(c.cleaned, '') AS cleaned
FROM t LEFT JOIN c ON c.doc_id = t.doc_id
""",
        # context-window chunking: 500-codepoint windows every 400
        # (substr is codepoint-based, matching utf8_slice_codeunits)
        "chunk_docs": """
WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents),
c AS (SELECT doc_id, text,
        unnest(range(0, CASE WHEN n <= 500 THEN 1
                             ELSE 1 + ((n - 500 + 399) // 400) END)) AS i
      FROM t)
SELECT doc_id, i::BIGINT AS chunk_id,
       substr(text, (i * 400 + 1)::BIGINT, 500) AS chunk_text
FROM c
""",
        # Gopher-style repetition: duplicate-line char fraction, duplicate
        # 3-gram fraction, top-bigram occupancy. Lines split on \n exactly
        # like pc.split_pattern; n-grams over the shared tokenizer.
        "repetition_scores": f"""
WITH l AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents
),
lc AS (SELECT doc_id, line, length(line) AS len, count(*) AS c
       FROM l GROUP BY doc_id, line),
lf AS (SELECT doc_id,
  CASE WHEN sum(len * c) = 0 THEN 0.0
       ELSE round(sum(CASE WHEN c > 1 THEN len * c ELSE 0 END)::DOUBLE
                  / sum(len * c), 6) END AS dup_line_frac
  FROM lc GROUP BY doc_id),
t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
tg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g FROM t),
tstat AS (SELECT doc_id, count(*)::DOUBLE AS total,
                 count(DISTINCT g)::DOUBLE AS dist FROM tg GROUP BY doc_id),
bg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
          i -> toks[i] || ' ' || toks[i+1])) AS g FROM t),
bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
bstat AS (SELECT doc_id, max(c)::DOUBLE AS maxc, sum(c)::DOUBLE AS total
          FROM bc GROUP BY doc_id)
SELECT d.doc_id,
  lf.dup_line_frac,
  COALESCE(round(1.0 - tstat.dist / tstat.total, 6), 0.0) AS dup_ngram_frac,
  COALESCE(round(bstat.maxc / bstat.total, 6), 0.0) AS top_bigram_frac
FROM documents d
LEFT JOIN lf ON d.doc_id = lf.doc_id
LEFT JOIN tstat ON d.doc_id = tstat.doc_id
LEFT JOIN bstat ON d.doc_id = bstat.doc_id
""",
        "redact_pii": r"""
SELECT doc_id,
       regexp_replace(
         regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
         '[0-9]{6,}', '[NUM]', 'g') AS redacted
FROM documents
""",
        "quality_filter": f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
SELECT doc_id, text FROM t
WHERE len(toks) >= 5 AND
  round(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in')))::DOUBLE
        / len(toks), 6) <= 0.5
""",
        # C4-style banned-term gate: token-level membership against the
        # pinned blocklist (substrings don't count on either side)
        "blocklist_filter": f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
SELECT doc_id, text FROM t
WHERE len(list_filter(toks, x -> x IN ('dup','slow','zzzbanned'))) = 0
""",
        # the export sink = quality_filter composed with redact_pii,
        # round-tripped through the parquet artifact on the engine side
        "export_clean": fr"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
SELECT doc_id,
       regexp_replace(
         regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '[EMAIL]', 'g'),
         '[0-9]{{6,}}', '[NUM]', 'g') AS redacted
FROM t
WHERE len(toks) >= 5 AND
  round(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in')))::DOUBLE
        / len(toks), 6) <= 0.5
""",
        "lang_id": f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
c AS (SELECT doc_id,
  len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) AS c_de,
  len(list_filter(toks, x -> x IN ('the','a','of','and','is')))     AS c_en,
  len(list_filter(toks, x -> x IN ('el','la','de','y','es')))       AS c_es,
  len(list_filter(toks, x -> x IN ('le','la','de','et','est')))     AS c_fr,
  len(list_filter(toks, x -> x IN ('de','shi','le','he','zai')))    AS c_zh
  FROM t)
SELECT doc_id, CASE
  WHEN greatest(c_de, c_en, c_es, c_fr, c_zh) = 0 THEN 'unknown'
  WHEN c_de = greatest(c_de, c_en, c_es, c_fr, c_zh) THEN 'de'
  WHEN c_en = greatest(c_de, c_en, c_es, c_fr, c_zh) THEN 'en'
  WHEN c_es = greatest(c_de, c_en, c_es, c_fr, c_zh) THEN 'es'
  WHEN c_fr = greatest(c_de, c_en, c_es, c_fr, c_zh) THEN 'fr'
  ELSE 'zh' END AS pred_lang
FROM c
""",
        "lineitem_agg": """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(l_quantity) * 100, 0) AS BIGINT) AS sum_qty_x100,
       CAST(round(sum(l_extendedprice) * 100, 0) AS BIGINT) AS sum_price_x100,
       count(*)::BIGINT AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
        # TPC-H Q3 shape: revenue quantized per ROW to cents before the
        # group sum (order-independent, hash-exact); top-10 by revenue
        "tpch_q3": """
SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
       sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                AS BIGINT)) AS revenue_x100
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue_x100 DESC, l_orderkey LIMIT 10
""",
        "tpch_q5": """
SELECT n.n_name,
       sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                AS BIGINT)) AS revenue_x100
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
               AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1
ORDER BY revenue_x100 DESC, n_name
""",
        "tpch_q10": """
SELECT c.c_custkey, c.c_name, n.n_name,
       sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                AS BIGINT)) AS revenue_x100
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue_x100 DESC, c_custkey LIMIT 20
""",
        "orders_customer_join": """
SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_mktsegment
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""",
        # skew-aware physical plan, same logical join -> same oracle
        "orders_customer_join_skew": """
SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_mktsegment
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""",
        # auto-planned (broadcast) physical plan, same logical join
        "orders_customer_join_auto": """
SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_mktsegment
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""",
        # full outer: unmatched on BOTH sides; key coalesced across sides
        "orders_customer_full": """
SELECT coalesce(o.o_custkey, c.c_custkey)::BIGINT AS o_custkey,
       o.o_orderkey, c.c_name
FROM (SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 2 = 0) o
FULL OUTER JOIN (SELECT c_custkey, c_name FROM customer
                 WHERE c_mktsegment = 'BUILDING') c
ON o.o_custkey = c.c_custkey
""",
        "orders_semi_building": """
SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus
FROM orders o
WHERE o.o_custkey IN
      (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
""",
        # bloom-accelerated anti join (sound direction: definite-absent
        # rows are definite keeps)
        "orders_anti_building": """
SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus
FROM orders o
WHERE o.o_custkey NOT IN
      (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
""",
        # bloom-prefiltered semi join: by construction identical rows to
        # orders_semi_building (the filter has no false negatives and an
        # exact join runs behind it) -> same oracle
        "orders_semi_bloom": """
SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus
FROM orders o
WHERE o.o_custkey IN
      (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
""",
        "simhash_fingerprints": f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS s FROM documents),
tf AS (SELECT doc_id, s, count(*)::HUGEINT AS tf FROM tok GROUP BY 1, 2),
th AS (SELECT doc_id, tf, ({_HEX64}) AS h FROM tf),
bits AS (SELECT doc_id, b.b,
                sum(tf * (2 * ((h >> b.b) & 1)::HUGEINT - 1)) AS acc
         FROM th, (SELECT unnest(range(64)) AS b) b GROUP BY 1, 2),
fp AS (SELECT doc_id,
              sum(CASE WHEN acc > 0 THEN (1::UBIGINT << b) ELSE 0 END) AS sh
       FROM bits GROUP BY 1)
SELECT d.doc_id, coalesce(fp.sh, 0)::UBIGINT AS simhash
FROM documents d LEFT JOIN fp ON fp.doc_id = d.doc_id
""",
        # banded simhash near-dup pairs are pigeonhole-EXACT at the
        # radius, so the oracle is brute-force Hamming over the same
        # recomputed fingerprints
        "simhash_neardup": f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS s FROM documents),
tf AS (SELECT doc_id, s, count(*)::HUGEINT AS tf FROM tok GROUP BY 1, 2),
th AS (SELECT doc_id, tf, ({_HEX64}) AS h FROM tf),
bits AS (SELECT doc_id, b.b,
                sum(tf * (2 * ((h >> b.b) & 1)::HUGEINT - 1)) AS acc
         FROM th, (SELECT unnest(range(64)) AS b) b GROUP BY 1, 2),
fp AS (SELECT doc_id,
              sum(CASE WHEN acc > 0 THEN (1::UBIGINT << b) ELSE 0 END) AS sh
       FROM bits GROUP BY 1),
fpd AS (SELECT d.doc_id, coalesce(fp.sh, 0)::UBIGINT AS sh
        FROM documents d LEFT JOIN fp ON fp.doc_id = d.doc_id)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.sh, b.sh))::INT AS "min(hamming)"
FROM fpd a JOIN fpd b ON b.doc_id > a.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= 3
""",
        # incremental simhash: cross pairs between the delta shard and
        # the corpus behind the persisted band artifact (same brute
        # Hamming oracle, cross-side restriction)
        "simhash_neardup_delta": f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS s FROM documents),
tf AS (SELECT doc_id, s, count(*)::HUGEINT AS tf FROM tok GROUP BY 1, 2),
th AS (SELECT doc_id, tf, ({_HEX64}) AS h FROM tf),
bits AS (SELECT doc_id, b.b,
                sum(tf * (2 * ((h >> b.b) & 1)::HUGEINT - 1)) AS acc
         FROM th, (SELECT unnest(range(64)) AS b) b GROUP BY 1, 2),
fp AS (SELECT doc_id,
              sum(CASE WHEN acc > 0 THEN (1::UBIGINT << b) ELSE 0 END) AS sh
       FROM bits GROUP BY 1),
fpd AS (SELECT d.doc_id, coalesce(fp.sh, 0)::UBIGINT AS sh
        FROM documents d LEFT JOIN fp ON fp.doc_id = d.doc_id)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.sh, b.sh))::INT AS "min(hamming)"
FROM fpd a JOIN fpd b ON a.doc_id % 8 <> 7 AND b.doc_id % 8 = 7
WHERE bit_count(xor(a.sh, b.sh)) <= 3
""",
    }
