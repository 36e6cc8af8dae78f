"""Simulate the driver's correctness gate: run every queries() entry at
sf0.01 and compare to its oracle_sql via DuckDB — row count, schema
(column names), and order-insensitive exact values (floats pre-rounded by
both sides)."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_df(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        from donkey_ray.util import dataset_to_table

        result = dataset_to_table(result)
    if isinstance(result, pa.Table):
        result = result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


def test_every_oracle_has_a_query(contract):
    qs, sqls = contract
    assert set(sqls) <= set(qs)


NAMES = [
    "bm25_topk", "bm25_topk_and", "bm25_topk_wand", "bm25_topk_incremental",
    "phrase_topk", "near_topk", "prefix_topk", "facet_counts", "snippets",
    "bm25_topk_hydrated", "events_window", "term_df",
    "stemmed_topk", "stem_term_df", "folded_term_df",
    "doc_token_counts", "corpus_stats", "top_terms", "top_bigrams",
    "stratified_sample",
    "content_sha256", "filter_project", "exact_dedup", "ngram_jaccard",
    "dedup_clusters",
    "ann_topk", "ann_ivf_topk", "embedding_neardup", "quality_scores",
    "lang_id", "lineitem_agg", "sample_docs", "doc_fingerprints",
    "simhash_fingerprints", "orders_customer_join", "orders_semi_building",
    "events_sessions", "events_asof_error", "events_quantiles",
    "events_distinct_users", "top_terms_per_lang", "redact_pii",
    "quality_filter",
    # round-2 late additions
    "bm25_topk_scatter", "bm25_topk_not", "fuzzy_topk", "rerank_cosine",
    "similar_docs", "suggest", "index_stats", "regex_search",
    "cooccurrence", "doclen_quantiles", "cluster_canonical",
    "dedup_survivors", "export_clean", "events_sliding", "lineitem_rollup",
    "bm25_topk_msm", "collapse_topk", "decontaminate", "explain_scores",
    "search_page2", "fuzzy_topk_incremental", "synonym_topk",
    "embedding_centroids", "orders_customer_full", "events_running",
    "filtered_topk", "events_funnel", "events_pivot", "longest_per_lang",
    "boosted_topk", "hit_counts", "value_histogram", "spell_correct",
    "curate_corpus", "mix_sample",
    "wildcard_topk", "fielded_topk", "events_in_sessions", "heavy_hitters",
    "substring_search", "grep_indexed", "object_search",
    "bpe_token_counts",
    # session-5 additions
    "repetition_scores", "pack_shards", "chunk_docs", "dedup_lines",
    "hybrid_topk",
    # session-6 additions
    "perplexity", "ccnet_buckets", "dup_spans", "dedup_lines_global",
    "events_retention",
    "winnow_fingerprints", "winnow_matches", "remove_dup_spans",
    "tfidf_keywords", "pmi_collocations", "embedding_clusters",
    "knn_label_eval", "tpch_q3", "events_anomalies", "longest_docs",
    # session-8 additions
    "pagerank", "events_moving", "orders_semi_bloom",
    "ngram_jaccard_delta", "events_quantiles_sketch",
    "orders_customer_join_skew", "dedup_triangles", "events_validate",
    "orders_customer_join_auto", "doclen_percentiles",
    "orders_anti_building", "lineitem_cube", "events_delta", "term_counts_cms",
    # session-9 additions
    "pca_component", "pca_residuals", "kmeans_clusters", "kmeans_centroids",
    "sif_embeddings", "dsir_weights",
    "nb_scores", "nb_confusion", "stratified_split", "weighted_sample",
    "jl_project", "token_entropy",
    # session-11 additions
    "minhash_neardup", "events_distinct_approx",
    "bpe_merges", "bpe_encode", "prf_topk", "bool_topk", "semdedup",
    "bm25f_topk", "pq_codes", "pq_search", "ivfpq_topk", "search_eval",
    "mmr_topk",
    "passage_topk", "pruned_topk", "tiered_topk", "blocklist_filter",
    # session-16 additions
    "tpch_q5", "sorted_topk", "stop_topk", "dedup_degree",
    "ann_sharded_topk", "corpus_report", "tpch_q10", "threshold_topk",
    "grouped_split",
    # round-3 additions
    "minhash_neardup_delta", "graph_topk_recall", "epoch_shuffle",
    "simhash_neardup", "simhash_neardup_delta",
    # round-4 additions
    "bm25_topk_per_lang", "media_pixel_stats", "audio_fingerprints",
    "sloppy_topk",
]


def test_every_sql_oracle_is_in_the_matrix(contract):
    """NAMES is the sweep the CI gate runs — a queries() entry with a SQL
    oracle that is missing from NAMES would silently skip verification."""
    qs, sqls = contract
    assert set(sqls) == set(NAMES), (
        sorted(set(sqls) - set(NAMES)), sorted(set(NAMES) - set(sqls)))


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(contract, oracle_con, name):
    qs, sqls = contract
    got = _canon(_to_df(qs[name](SF_DIR)))
    want = _canon(oracle_con.execute(sqls[name]).fetchdf())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    for col in got.columns:
        g, w = got[col], want[col]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            pd.testing.assert_series_equal(
                g.astype(float), w.astype(float), check_names=False,
                rtol=0, atol=0, obj=f"{name}.{col}",
            )
        else:
            assert g.astype(str).tolist() == w.astype(str).tolist(), f"{name}.{col}"


def test_rows_only_queries_run(contract):
    qs, sqls = contract
    rows_only = set(qs) - set(sqls)
    assert rows_only == {"ann_graph_topk", "compressibility"}
    for name in sorted(rows_only):
        df = _to_df(qs[name](SF_DIR))
        assert len(df) >= 0 and len(df.columns) >= 2


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    df = _to_df(e.entry())
    assert {"query_id", "rank", "doc_id", "score"} <= set(df.columns)
    assert len(df) > 0
