"""Implementation behind __ray_entry__ (driver contract).

Every callable takes sf_dir and returns a Dataset / pyarrow Table whose
column NAMES and float ROUNDING exactly mirror the DuckDB oracle SQL in
__ray_entry__.oracle_sql (driver hashes values after sorting columns by
name). Never calls ray.init/shutdown.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .pipelines import analyze, dedup
from .pipelines.ann import brute_force_topk, embedding_neardup_pairs
from .pipelines.build import build_index
from .pipelines.query import score_queries
from .sources.corpus import documents_as_corpus
from .util import dataset_to_table

# v3: token_hash64 pinned to sha256-top64 (minhash SQL oracle) — every
# shingle-hash-bearing artifact (pair graph, clusters, dedup index)
# changes value, so the whole cache namespace is versioned
CACHE_ROOT = "/tmp/donkey_ray_cache_v3"

# Pinned query set over the documents corpus (terms from its vocabulary,
# plus an absent term and a duplicated term — FIXTURES.md section 2 mix)
PINNED_QUERIES = [
    (0, "table", 10),
    (1, "spark merge", 10),
    (2, "window sort key", 10),
    (3, "zzzabsent", 10),
    (4, "value value", 10),
]

# Pinned phrase-query set (positional index): a common bigram, a
# duplicated-term phrase (overlapping occurrences), a matching trigram,
# a zero-match phrase, and a second bigram
PINNED_PHRASES = [
    (0, "data table", 10),
    (1, "value value", 10),
    (2, "value a table", 10),
    (3, "window sort key", 10),
    (4, "spark merge", 10),
]

# Pinned prefix-query set (wildcard): a 6-way expansion, two 2-way
# expansions, a single-term expansion and an absent prefix
PINNED_PREFIXES = [
    (0, "s", 10),
    (1, "v", 10),
    (2, "qu", 10),
    (3, "zz", 10),
    (4, "b", 10),
]

# Pinned proximity-query set (positional index): anchor = first distinct
# term; docs must contain every term with each non-anchor term within
# NEAR_WINDOW-1 positions of some anchor occurrence. Mix: two bigrams, a
# trigram, an absent term (zero matches), and a duplicated term
# (degenerate single-term query).
PINNED_NEAR = [
    (0, "table value", 10),
    (1, "spark merge", 10),
    (2, "window sort key", 10),
    (3, "table zzzabsent", 10),
    (4, "value value", 10),
]
NEAR_WINDOW = 3

ANN_QUERY_IDS = [0, 1, 2, 3, 4]
ANN_K = 10
NEARDUP_COS_THRESHOLD = 0.35
JACCARD_N = 1
JACCARD_THRESHOLD = 0.5


def _index_dir(sf_dir: str) -> str:
    key = hashlib.sha256(sf_dir.encode()).hexdigest()[:16]
    return os.path.join(CACHE_ROOT, f"idx-{key}")


CURRENT_FORMAT_VERSION = 3


def ensure_index(sf_dir: str) -> str:
    """Build (once; resumable) the BM25 index over the documents corpus.
    A cached index from an older segment format is rebuilt, not trusted."""
    import shutil

    from .state import manifest as mf

    out = _index_dir(sf_dir)
    if mf.is_complete(out):
        try:
            if mf.load_meta(out).get("format_version") != CURRENT_FORMAT_VERSION:
                shutil.rmtree(out)
        except (OSError, ValueError):
            shutil.rmtree(out, ignore_errors=True)
    build_index(
        documents_as_corpus(sf_dir),
        out,
        num_partitions=8,
        id_col="doc_id",
        query_lang="simple",
        sample_mod=16,
    )
    return out


def ensure_positional_index(sf_dir: str) -> str:
    """Build (once; resumable) a POSITIONAL BM25 index — same corpus and
    routing as ensure_index, plus per-posting token positions for phrase
    queries. Kept as a separate artifact: positions cost extra bytes, so
    non-phrase serving keeps using the plain index."""
    import shutil

    from .state import manifest as mf

    out = _index_dir(sf_dir) + "-pos"
    if mf.is_complete(out):
        try:
            meta = mf.load_meta(out)
            if (meta.get("format_version") != CURRENT_FORMAT_VERSION
                    or not meta.get("positions")):
                shutil.rmtree(out)
        except (OSError, ValueError):
            shutil.rmtree(out, ignore_errors=True)
    build_index(
        documents_as_corpus(sf_dir),
        out,
        num_partitions=8,
        id_col="doc_id",
        query_lang="simple",
        sample_mod=16,
        positions=True,
    )
    return out


def _docs(sf_dir: str, columns=("doc_id", "text")) -> ray.data.Dataset:
    # documents is a small single-file table: don't over-split it
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=list(columns), override_num_blocks=8
    )


def _round_col(tbl: pa.Table, col: str, digits: int = 6) -> pa.Table:
    # half_towards_infinity matches DuckDB round()'s halfway behavior
    # (Arrow defaults to half_to_even, which would diverge on a value
    # landing exactly on a decimal half)
    i = tbl.column_names.index(col)
    return tbl.set_column(i, col, pc.round(
        tbl.column(col), ndigits=digits,
        round_mode="half_towards_infinity"))


# ---- engine queries ----

def q_bm25_topk(sf_dir: str) -> pa.Table:
    index_dir = ensure_index(sf_dir)
    queries = pa.table(
        {
            "query_id": pa.array([q[0] for q in PINNED_QUERIES], pa.int64()),
            "text": pa.array([q[1] for q in PINNED_QUERIES], pa.string()),
            "k": pa.array([q[2] for q in PINNED_QUERIES], pa.int32()),
        }
    )
    res = dataset_to_table(score_queries(index_dir, queries, mode="auto"))
    res = res.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    return _round_col(res, "score")


# Pinned stem-analyzer query set: plural queries that only match through
# the s-stemmer (the corpus vocabulary is singular), a stemmed absent
# term, and a duplicated plural
PINNED_STEM_QUERIES = [
    (0, "tables", 10),
    (1, "queries merge", 10),
    (2, "values windows keys", 10),
    (3, "zzzabsents", 10),
    (4, "keys keys", 10),
]


def _ensure_analyzer_index(sf_dir: str, analyzer: str) -> str:
    """Build (once; resumable) a BM25 index under a non-default pinned
    ANALYZER (stem / stop / ...): index-side terms and query-side terms
    both go through it (analyzer_lang override + matching query_lang).
    One helper for every analyzer artifact so the cache-staleness checks
    can't drift between them; a cached index failing ANY of the checks
    (format, query_lang, analyzer_lang) is rebuilt, not trusted."""
    import shutil

    from .state import manifest as mf

    out = _index_dir(sf_dir) + "-" + analyzer
    if mf.is_complete(out):
        try:
            meta = mf.load_meta(out)
            if (meta.get("format_version") != CURRENT_FORMAT_VERSION
                    or meta.get("query_lang") != analyzer
                    or meta.get("analyzer_lang") != analyzer):
                shutil.rmtree(out)
        except (OSError, ValueError):
            shutil.rmtree(out, ignore_errors=True)
    build_index(
        documents_as_corpus(sf_dir),
        out,
        num_partitions=8,
        id_col="doc_id",
        query_lang=analyzer,
        analyzer_lang=analyzer,
        sample_mod=16,
    )
    return out


def ensure_stem_index(sf_dir: str) -> str:
    """Stem-analyzer index (pinned s-stemmer): plural/singular unify."""
    return _ensure_analyzer_index(sf_dir, "stem")


def q_stemmed_topk(sf_dir: str) -> pa.Table:
    index_dir = ensure_stem_index(sf_dir)
    queries = pa.table(
        {
            "query_id": pa.array([q[0] for q in PINNED_STEM_QUERIES], pa.int64()),
            "text": pa.array([q[1] for q in PINNED_STEM_QUERIES], pa.string()),
            "k": pa.array([q[2] for q in PINNED_STEM_QUERIES], pa.int32()),
        }
    )
    res = dataset_to_table(score_queries(index_dir, queries, mode="auto"))
    res = res.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    return _round_col(res, "score")


def q_stem_term_df(sf_dir: str) -> ray.data.Dataset:
    """df per STEMMED term — the stem analyzer through the analyze path."""
    return analyze.term_df(_docs(sf_dir), lang="stem")


# Pinned stopword-analyzer query set: stopword-padded queries (behave as
# their content terms), an all-stopword query (zero results), and a dup
PINNED_STOP_QUERIES = [
    (0, "the table", 10),
    (1, "a spark merge", 10),
    (2, "window sort key", 10),
    (3, "the a of", 10),
    (4, "value value", 10),
]


def ensure_stop_index(sf_dir: str) -> str:
    """Stopword-analyzer index: closed-class words never enter the
    postings, and dl counts content tokens only."""
    return _ensure_analyzer_index(sf_dir, "stop")


def q_stop_topk(sf_dir: str) -> pa.Table:
    """BM25 through the stopword analyzer: stopword-padded queries score
    identically to their content terms; an all-stopword query returns
    nothing (pipelines/build analyzer_lang + StopTokenizer)."""
    index_dir = ensure_stop_index(sf_dir)
    queries = pa.table(
        {
            "query_id": pa.array([q[0] for q in PINNED_STOP_QUERIES], pa.int64()),
            "text": pa.array([q[1] for q in PINNED_STOP_QUERIES], pa.string()),
            "k": pa.array([q[2] for q in PINNED_STOP_QUERIES], pa.int32()),
        }
    )
    res = dataset_to_table(score_queries(index_dir, queries, mode="auto"))
    res = res.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    return _round_col(res, "score")


def q_folded_term_df(sf_dir: str) -> ray.data.Dataset:
    """df per ACCENT-FOLDED term (pinned Latin fold map, lang='fold')."""
    return analyze.term_df(_docs(sf_dir), lang="fold")


# Pinned fuzzy (edit-distance-1) query set: a deletion, an insertion, a
# substitution, an absent term, a multi-term mix (typo + exact), and a
# short-term route (len <= 3 terms live in the short-terms file)
PINNED_FUZZY = [
    (0, "tabl", 10),
    (1, "vallue", 10),
    (2, "windoe", 10),
    (3, "zzzabsent", 10),
    (4, "quer merge", 10),
    (5, "ke", 10),
]

# Pinned wildcard patterns: suffix (3-gram probe + 2-gram fallback probe),
# contains (gram + substring-scan fallback), a trailing-star prefix, a
# plain term, and a zero-match suffix
PINNED_WILDCARD = [
    (0, "*er", 10),
    (1, "*ow", 10),
    (2, "*or*", 10),
    (3, "*alu*", 10),
    (4, "val*", 10),
    (5, "table", 10),
    (6, "*zz", 10),
]


def q_wildcard_topk(sf_dir: str) -> pa.Table:
    """Leading/trailing wildcard retrieval: ``*suf`` and ``*mid*`` expand
    through the trigram artifact (a hash-sharded dictionary cannot route
    a leading wildcard), ``pre*`` through the sharded dictionary's range
    scan; disjunctive BM25 over the expansion."""
    from .pipelines.fuzzy import wildcard_topk

    index_dir = ensure_index(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, pattern, k in PINNED_WILDCARD:
        for r, (d, s) in enumerate(
            wildcard_topk(index_dir, pattern, k), start=1
        ):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    res = pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "rank": pa.array(ranks, pa.int32()),
            "doc_id": pa.array(docs, pa.int64()),
            "score": pa.array(scores, pa.float64()),
        }
    )
    return _round_col(res, "score")


# Pinned multi-field query set: (query_id, content terms, source terms, k).
# Mix: content+source, source-only, content-only, absent source, absent
# content, both absent (zero rows)
PINNED_FIELDED = [
    (0, "table", "src18", 10),
    (1, "spark merge", "src7", 10),
    (2, "", "src12", 10),
    (3, "window sort", "", 10),
    (4, "value", "zzznope", 10),
    (5, "zzzabsent", "zzznope", 10),
]
FIELD_WEIGHTS = {"content": 1.0, "source": 2.0}


def ensure_source_index(sf_dir: str) -> str:
    """Build (once; resumable) the SOURCE-field index: same doc_id space
    as the content index, content := the documents 'source' column, so
    per-field BM25 statistics (df, avgdl) are honest to that field."""
    from .sources.corpus import documents_as_corpus

    out = _index_dir(sf_dir) + "_field_source"
    build_index(
        documents_as_corpus(sf_dir, content_col="source"),
        out,
        num_partitions=4,
        id_col="doc_id",
        query_lang="simple",
        sample_mod=16,
    )
    return out


def q_fielded_topk(sf_dir: str) -> pa.Table:
    """Multi-field weighted BM25 (content x1 + source x2): each field is
    its own index over the shared doc_id space; a doc's score is the
    weighted sum of its per-field disjunctive BM25 scores over the
    UNTRUNCATED per-field hit sets."""
    from .pipelines.query import fielded_topk

    idx = {"content": ensure_index(sf_dir),
           "source": ensure_source_index(sf_dir)}
    qids, ranks, docs, scores = [], [], [], []
    for qid, content_q, source_q, k in PINNED_FIELDED:
        hits = fielded_topk(
            idx, {"content": content_q, "source": source_q},
            FIELD_WEIGHTS, k,
        )
        for r, (d, s) in enumerate(hits, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    res = pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "rank": pa.array(ranks, pa.int32()),
            "doc_id": pa.array(docs, pa.int64()),
            "score": pa.array(scores, pa.float64()),
        }
    )
    return _round_col(res, "score")


def ensure_per_lang_indexes(sf_dir: str) -> "dict[str, str]":
    """One index per language over the documents corpus — each lang's
    BM25 statistics (n_docs, avgdl, df) are its own collection's
    (SURVEY §1.2 per-lang stats; VERDICT r3 item 5). Lang discovery
    here is a driver-side distinct over one dictionary-encoded column
    (bounded: lang cardinality, not corpus size); at 100 TB the same
    distinct runs as a Ray aggregate feeding the same per-lang builds."""
    import shutil

    import pyarrow.parquet as _pq

    from .sources.corpus import documents_as_corpus
    from .state import manifest as mf

    # columnar distinct: only n_langs values ever become Python objects
    langs = sorted(pc.unique(
        _pq.read_table(f"{sf_dir}/documents.parquet", columns=["lang"])
        .column("lang")).to_pylist())
    out = {}
    for lg in langs:
        d = _index_dir(sf_dir) + f"_lang_{lg}"
        if mf.is_complete(d):
            # same stale-format rebuild guard as every other ensure_*
            try:
                if mf.load_meta(d).get(
                        "format_version") != CURRENT_FORMAT_VERSION:
                    shutil.rmtree(d)
            except (OSError, ValueError):
                shutil.rmtree(d, ignore_errors=True)
        build_index(
            documents_as_corpus(sf_dir, lang=lg),
            d,
            num_partitions=2,
            id_col="doc_id",
            query_lang="simple",
            sample_mod=16,
        )
        out[lg] = d
    return out


PINNED_PER_LANG = [
    (0, "table", 10),
    (1, "spark merge", 10),
    (2, "window sort key", 10),
    (3, "zzzabsent", 10),
    (4, "value value", 10),
]


def q_bm25_topk_per_lang(sf_dir: str) -> pa.Table:
    """Language-partitioned BM25: every hit is scored against its own
    language's collection stats (per-lang n_docs/avgdl/df — the per-lang
    index family), merged globally (score desc, doc_id asc)."""
    from .pipelines.query import per_lang_topk
    from .stages.score import QueryEngine

    idx = ensure_per_lang_indexes(sf_dir)
    engines = {lg: QueryEngine(d) for lg, d in idx.items()}
    qids, ranks, docs, langs, scores = [], [], [], [], []
    for qid, text, k in PINNED_PER_LANG:
        hits = per_lang_topk(idx, text, k, engines=engines)
        for r, (lg, d, s) in enumerate(hits, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            langs.append(lg)
            scores.append(s)
    res = pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "rank": pa.array(ranks, pa.int32()),
            "doc_id": pa.array(docs, pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "score": pa.array(scores, pa.float64()),
        }
    )
    return _round_col(res, "score")


def q_fuzzy_topk(sf_dir: str) -> pa.Table:
    """Fuzzy retrieval: each query term expands to its edit-distance-1
    dictionary matches via the trigram artifact (complete for
    max_edit=1), then ordinary disjunctive BM25 over the expansion."""
    from .pipelines.fuzzy import fuzzy_topk

    index_dir = ensure_index(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text, k in PINNED_FUZZY:
        for r, (d, s) in enumerate(fuzzy_topk(index_dir, text, k), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    res = pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "rank": pa.array(ranks, pa.int32()),
            "doc_id": pa.array(docs, pa.int64()),
            "score": pa.array(scores, pa.float64()),
        }
    )
    return _round_col(res, "score")


RERANK_CANDIDATES = 50


def q_rerank_cosine(sf_dir: str) -> pa.Table:
    """Two-stage retrieval: BM25 top-50 candidates re-scored by full
    tf-idf cosine between query and candidate document vectors (doc
    norms over ALL doc terms, idf from the sharded dictionary), top-10
    kept — donkey's search -> object-rerank shape."""
    from .pipelines.query import rerank_cosine

    index_dir = ensure_index(sf_dir)
    queries = pa.table(
        {
            "query_id": pa.array([q[0] for q in PINNED_QUERIES], pa.int64()),
            "text": pa.array([q[1] for q in PINNED_QUERIES], pa.string()),
            "k": pa.array([q[2] for q in PINNED_QUERIES], pa.int32()),
        }
    )
    res = rerank_cosine(
        index_dir, queries, f"{sf_dir}/documents.parquet",
        candidates=RERANK_CANDIDATES, k=10,
    )
    res = res.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    return _round_col(res, "cos_sim")


# Pinned boolean-NOT query set: plain exclusion, multi-term positive
# with a ~100%-df negation, absent negation (== plain query), absent
# positive (empty), and self-negation (empty)
PINNED_NOT = [
    (0, "table", "value", 10),
    (1, "spark merge", "the", 10),
    (2, "window", "zzzabsent", 10),
    (3, "zzzabsent", "table", 10),
    (4, "value value", "value", 10),
]


def q_bm25_topk_not(sf_dir: str) -> pa.Table:
    """Boolean NOT retrieval: disjunctive BM25 over the positive terms,
    excluding every doc containing any negated term (exclusion applied
    before truncation)."""
    index_dir = ensure_index(sf_dir)
    queries = pa.table(
        {
            "query_id": pa.array([q[0] for q in PINNED_NOT], pa.int64()),
            "text": pa.array([q[1] for q in PINNED_NOT], pa.string()),
            "neg_text": pa.array([q[2] for q in PINNED_NOT], pa.string()),
            "k": pa.array([q[3] for q in PINNED_NOT], pa.int32()),
        }
    )
    res = dataset_to_table(score_queries(index_dir, queries, kind="not"))
    res = res.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    return _round_col(res, "score")


PRUNE_KEEP_FRAC = 0.5


def ensure_pruned_index(sf_dir: str) -> str:
    """Prune (once) the documents index at keep_frac=0.5 — the lossy
    static-pruning artifact (pipelines/prune.py)."""
    from .pipelines.prune import prune_index
    from .state import manifest as mf

    out = _index_dir(sf_dir) + "_pruned50"
    if not mf.is_complete(out):
        prune_index(ensure_index(sf_dir), out, keep_frac=PRUNE_KEEP_FRAC)
    return out


def q_pruned_topk(sf_dir: str) -> pa.Table:
    """BM25 top-k over the statically PRUNED index (Carmel-style: each
    term keeps its top ceil(0.5*df) postings by tf desc, doc asc; idf
    shifts to the pruned df, corpus stats stay original) — the standard
    serving path over the smaller artifact."""
    index_dir = ensure_pruned_index(sf_dir)
    queries = pa.table(
        {
            "query_id": pa.array([q[0] for q in PINNED_QUERIES], pa.int64()),
            "text": pa.array([q[1] for q in PINNED_QUERIES], pa.string()),
            "k": pa.array([q[2] for q in PINNED_QUERIES], pa.int32()),
        }
    )
    res = dataset_to_table(score_queries(index_dir, queries))
    res = res.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    return _round_col(res, "score")


def q_tiered_topk(sf_dir: str) -> pa.Table:
    """Tiered serving: answer from the pruned tier-1 index, falling back
    to the full index only for queries tier-1 cannot fill to k
    (pipelines/query.tiered_topk)."""
    from .pipelines.query import tiered_topk

    pruned = ensure_pruned_index(sf_dir)
    full = ensure_index(sf_dir)
    # The pinned set plus one rare-term query ("dup", df=25 in the
    # synthetic corpus; pruned tier-1 keeps ceil(0.5*25)=13 < k=20) so
    # the tier-2 fallback path is exercised at the driver surface, not
    # only in pytest.
    pinned = PINNED_QUERIES + [(5, "dup", 20)]
    queries = pa.table(
        {
            "query_id": pa.array([q[0] for q in pinned], pa.int64()),
            "text": pa.array([q[1] for q in pinned], pa.string()),
            "k": pa.array([q[2] for q in pinned], pa.int32()),
        }
    )
    res = tiered_topk(pruned, full, queries, k=10)
    res = res.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    return _round_col(res, "score")


PASSAGE_SIZE, PASSAGE_STRIDE, PASSAGE_SHIFT = 500, 400, 100_000


def ensure_passage_index(sf_dir: str) -> str:
    """Build (once; resumable) the PASSAGE index: documents chunked with
    the pinned chunk_docs rule (500-char windows every 400), chunk doc
    ids = parent_doc_id * PASSAGE_SHIFT + chunk_id."""
    from .pipelines.analyze import chunk_docs

    out = _index_dir(sf_dir) + "_passages"
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    chunks = chunk_docs(docs, size=PASSAGE_SIZE, stride=PASSAGE_STRIDE)

    def adapt(batch: pa.Table) -> pa.Table:
        cid = (batch.column("doc_id").to_numpy(zero_copy_only=False)
               * PASSAGE_SHIFT
               + batch.column("chunk_id").to_numpy(zero_copy_only=False))
        n = batch.num_rows
        return pa.table({
            "repo": pa.array(["passages"] * n, pa.string()),
            "path": pa.array([str(v) for v in cid], pa.string()),
            "commit": pa.array([""] * n, pa.string()),
            "lang": pa.array(["simple"] * n, pa.string()),
            "content": batch.column("chunk_text").cast(pa.string()),
            "doc_id": pa.array(cid, pa.int64()),
        })

    build_index(
        chunks.map_batches(adapt, batch_format="pyarrow",
                           zero_copy_batch=True),
        out,
        num_partitions=8,
        id_col="doc_id",
        query_lang="simple",
        sample_mod=16,
    )
    return out


def q_passage_topk(sf_dir: str) -> pa.Table:
    """Best-passage-per-document retrieval (MaxP): BM25 over the pinned
    500/400 passage index, collapsed to each parent doc's best chunk
    (pipelines/query.passage_topk)."""
    from .pipelines.query import passage_topk

    index_dir = ensure_passage_index(sf_dir)
    queries = pa.table(
        {
            "query_id": pa.array([q[0] for q in PINNED_QUERIES], pa.int64()),
            "text": pa.array([q[1] for q in PINNED_QUERIES], pa.string()),
            "k": pa.array([q[2] for q in PINNED_QUERIES], pa.int32()),
        }
    )
    res = passage_topk(index_dir, queries, k=10, shift=PASSAGE_SHIFT)
    res = res.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    return _round_col(res, "score")


MMR_C, MMR_K, MMR_LAM = 50, 10, 0.7


def q_mmr_topk(sf_dir: str) -> pa.Table:
    """MMR result diversification (Carbonell & Goldstein 1998): BM25
    top-50 candidates, greedy lam=0.7 relevance-vs-max-cosine selection
    of 10 (pipelines/query.mmr_topk)."""
    from .pipelines.query import mmr_topk

    index_dir = ensure_index(sf_dir)
    queries = pa.table(
        {
            "query_id": pa.array([q[0] for q in PINNED_QUERIES], pa.int64()),
            "text": pa.array([q[1] for q in PINNED_QUERIES], pa.string()),
            "k": pa.array([q[2] for q in PINNED_QUERIES], pa.int32()),
        }
    )
    res = mmr_topk(
        index_dir, f"{sf_dir}/embeddings.parquet", queries,
        c=MMR_C, k=MMR_K, lam=MMR_LAM,
    )
    res = res.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    return _round_col(res, "mmr")


def q_search_eval(sf_dir: str) -> pa.Table:
    """Retrieval-quality metrics (precision@10, MRR, nDCG@10) of the
    BM25 run against the conjunctive-match relevance set
    (pipelines/query.search_eval)."""
    from .pipelines.query import search_eval

    index_dir = ensure_index(sf_dir)
    queries = pa.table(
        {
            "query_id": pa.array([q[0] for q in PINNED_QUERIES], pa.int64()),
            "text": pa.array([q[1] for q in PINNED_QUERIES], pa.string()),
            "k": pa.array([q[2] for q in PINNED_QUERIES], pa.int32()),
        }
    )
    res = search_eval(index_dir, queries, k=10).sort_by("query_id")
    for col in ("p_at_k", "mrr", "ndcg"):
        res = _round_col(res, col)
    return res


# Pinned BM25F query set: one text across both fields — both-field hits,
# content-only, source-only, absent, duplicated terms
PINNED_BM25F = [
    (0, "table src18", 10),
    (1, "spark merge", 10),
    (2, "src12", 10),
    (3, "zzzabsent", 10),
    (4, "value value src7", 10),
]


def q_bm25f_topk(sf_dir: str) -> pa.Table:
    """BM25F multi-field retrieval: per-field length-normalized, field
    -weighted tfs blended into one pseudo-tf that saturates once; idf
    from the union doc set (pipelines/query.bm25f_topk)."""
    from .pipelines.query import bm25f_topk

    idx = {"content": ensure_index(sf_dir),
           "source": ensure_source_index(sf_dir)}
    qids, ranks, docs, scores = [], [], [], []
    for qid, text, k in PINNED_BM25F:
        hits = bm25f_topk(idx, FIELD_WEIGHTS, text, k)
        for r, (d, s) in enumerate(hits, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    res = pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "rank": pa.array(ranks, pa.int32()),
            "doc_id": pa.array(docs, pa.int64()),
            "score": pa.array(scores, pa.float64()),
        }
    )
    return _round_col(res, "score")


# Pinned boolean-DSL query set: nested parens, OR-loosest precedence,
# binary NOT at both levels, absent-term AND (empty), implicit AND
PINNED_BOOL = [
    (0, "table AND (value OR key)", 10),
    (1, "spark OR merge NOT window", 10),
    (2, "(sort OR window) NOT (key AND value)", 10),
    (3, "zzzabsent AND table", 10),
    (4, "table value", 10),
]


def q_bool_topk(sf_dir: str) -> pa.Table:
    """Nested boolean retrieval (Lucene-style DSL: AND/OR/NOT + parens,
    implicit AND): match set from posting-list set algebra, scored by
    disjunctive BM25 over the positive-context terms
    (stages/score.QueryEngine.bool_topk)."""
    index_dir = ensure_index(sf_dir)
    queries = pa.table(
        {
            "query_id": pa.array([q[0] for q in PINNED_BOOL], pa.int64()),
            "text": pa.array([q[1] for q in PINNED_BOOL], pa.string()),
            "k": pa.array([q[2] for q in PINNED_BOOL], pa.int32()),
        }
    )
    res = dataset_to_table(score_queries(index_dir, queries, kind="bool"))
    res = res.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    return _round_col(res, "score")


# Pinned source docs for more-like-this (present at every sf)
PINNED_MLT_DOCS = [0, 7, 42]
MLT_K = 10


def q_similar_docs(sf_dir: str) -> pa.Table:
    """More-like-this: for each pinned source doc, the top-k docs by
    summed BM25 over the source doc's DISTINCT terms (the doc itself
    ranks at/near the top — kept in, matching the SQL mirror). The doc
    text is fetched by doc_id-pushdown parquet read and fed through the
    ordinary query engine: a document IS a query under the bag-of-words
    scorer, so related-document retrieval reuses the serving path."""
    import pyarrow.dataset as pads

    index_dir = ensure_index(sf_dir)
    src = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["doc_id", "text"],
        filter=pads.field("doc_id").isin(PINNED_MLT_DOCS),
    )
    queries = pa.table(
        {
            "query_id": src.column("doc_id").cast(pa.int64()),
            "text": src.column("text").cast(pa.string()),
            "k": pa.array([MLT_K] * src.num_rows, pa.int32()),
        }
    )
    res = dataset_to_table(score_queries(index_dir, queries, mode="auto"))
    res = res.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    return _round_col(res, "score")


# Pinned boost map + query set: a dominant boost, a down-weight, a
# boost on an absent term (no-op), plain (all 1.0), duplicated term
PINNED_BOOSTS = {"table": 3.0, "merge": 0.25, "zzzabsent": 9.0}
PINNED_BOOST_QUERIES = [
    (0, "table value", 10),
    (1, "spark merge", 10),
    (2, "window zzzabsent", 10),
    (3, "window sort key", 10),
    (4, "value value", 10),
]


def q_boosted_topk(sf_dir: str) -> pa.Table:
    """Query-time term boosting (term^w): disjunctive BM25 with each
    term's contribution scaled by its pinned boost."""
    from .stages.score import QueryEngine

    index_dir = ensure_index(sf_dir)
    eng = QueryEngine(index_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text, k in PINNED_BOOST_QUERIES:
        for r, (d, s) in enumerate(
            eng.boosted_topk(text, k, PINNED_BOOSTS), start=1
        ):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    res = pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "rank": pa.array(ranks, pa.int32()),
            "doc_id": pa.array(docs, pa.int64()),
            "score": pa.array(scores, pa.float64()),
        }
    )
    return _round_col(res, "score")


def q_hit_counts(sf_dir: str) -> pa.Table:
    """Exact result-count per pinned query (the "about N results"
    figure): union cardinality of the query terms' posting doc ids —
    no tf/position decode, no scoring."""
    from .stages.score import QueryEngine

    index_dir = ensure_index(sf_dir)
    eng = QueryEngine(index_dir)
    qids, ns = [], []
    for qid, text, _k in PINNED_QUERIES:
        n = eng.hit_count(text)
        if n:
            qids.append(qid)
            ns.append(n)
    return pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "n_hits": pa.array(ns, pa.int64()),
        }
    )


# Pinned synonym map + query set: a 1-way expansion, a multi-term query
# with one expandable term, a synonym absent from the corpus (== plain
# query), a double expansion, and an absent base term
PINNED_SYNONYMS = {"merge": ["join"], "sort": ["order"], "fast": ["quick"]}
PINNED_SYN_QUERIES = [
    (0, "merge", 10),
    (1, "sort key", 10),
    (2, "fast", 10),
    (3, "table merge", 10),
    (4, "zzzabsent", 10),
]


def q_synonym_topk(sf_dir: str) -> pa.Table:
    """Query-time synonym expansion over the pinned map: disjunctive
    BM25 where each term also contributes its mapped synonyms, each
    scoring with its own global df."""
    from .stages.score import QueryEngine

    index_dir = ensure_index(sf_dir)
    eng = QueryEngine(index_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text, k in PINNED_SYN_QUERIES:
        hits = eng.synonym_topk(text, k, PINNED_SYNONYMS)
        for r, (d, s) in enumerate(hits, start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    res = pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "rank": pa.array(ranks, pa.int32()),
            "doc_id": pa.array(docs, pa.int64()),
            "score": pa.array(scores, pa.float64()),
        }
    )
    return _round_col(res, "score")


def q_search_page2(sf_dir: str) -> pa.Table:
    """Cursor pagination: page 2 (global ranks 11..20) of every pinned
    query, fetched with search_after using page 1's last (score, doc_id)
    as the cursor — held to an oracle that pages by rank window, so the
    cursor semantics are proven equal to offset paging."""
    from .stages.score import QueryEngine

    index_dir = ensure_index(sf_dir)
    eng = QueryEngine(index_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text, k in PINNED_QUERIES:
        page1 = eng.topk(text, k)
        if len(page1) < k:
            continue  # no page 2
        d_last, s_last = page1[-1]
        for i, (d, s) in enumerate(eng.search_after(text, k, (s_last, d_last))):
            qids.append(qid)
            ranks.append(k + 1 + i)
            docs.append(d)
            scores.append(s)
    res = pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "rank": pa.array(ranks, pa.int32()),
            "doc_id": pa.array(docs, pa.int64()),
            "score": pa.array(scores, pa.float64()),
        }
    )
    return _round_col(res, "score")


PINNED_SPELL = [(0, "tabl"), (1, "vallue"), (2, "windoe"),
                (3, "zzzabsent"), (4, "merge")]


def q_spell_correct(sf_dir: str) -> pa.Table:
    """Did-you-mean: top-3 dictionary terms at exactly edit distance 1
    per pinned input, ranked by global df — candidates from the trigram
    artifact, df from the sharded dictionary."""
    from .pipelines.introspect import spell_correct

    index_dir = ensure_index(sf_dir)
    return spell_correct(index_dir, PINNED_SPELL, k=3)


def q_explain_scores(sf_dir: str) -> pa.Table:
    """Relevance debugging: per-(result doc, matched term) BM25 score
    breakdown for the pinned queries' top-10 pages — tf, global df and
    the term's contribution (contributions sum to the doc's score)."""
    from .stages.score import QueryEngine

    index_dir = ensure_index(sf_dir)
    eng = QueryEngine(index_dir)
    qids, docs, terms, tfs, dfs, contribs = [], [], [], [], [], []
    for qid, text, k in PINNED_QUERIES:
        for d, t, tf, df, c in eng.explain(text, k):
            qids.append(qid)
            docs.append(d)
            terms.append(t)
            tfs.append(tf)
            dfs.append(df)
            contribs.append(c)
    res = pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "term": pa.array(terms, pa.string()),
            "tf": pa.array(tfs, pa.float64()),
            "df": pa.array(dfs, pa.int64()),
            "contribution": pa.array(contribs, pa.float64()),
        }
    )
    return _round_col(res, "contribution")


def q_bm25_topk_scatter(sf_dir: str) -> pa.Table:
    """Same pinned query set through the DISTRIBUTED scatter-gather path
    (terms routed to partition-owning tasks, per-(query, doc) partials
    assembled by one keyed exchange) — held to the identical oracle as
    the actor-pool engine, so the two execution strategies are proven
    rank/score-identical by the driver itself."""
    from .pipelines.query import scatter_gather_topk

    index_dir = ensure_index(sf_dir)
    queries = pa.table(
        {
            "query_id": pa.array([q[0] for q in PINNED_QUERIES], pa.int64()),
            "text": pa.array([q[1] for q in PINNED_QUERIES], pa.string()),
            "k": pa.array([q[2] for q in PINNED_QUERIES], pa.int32()),
        }
    )
    res = scatter_gather_topk(index_dir, queries)
    res = res.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    return _round_col(res, "score")


def q_phrase_topk(sf_dir: str) -> pa.Table:
    """Exact phrase top-k over the positional index (pinned phrase set);
    scored as a pseudo-term (tf = occurrence starts incl. overlaps,
    df = matching docs) with the same BM25 constants as bm25_topk."""
    index_dir = ensure_positional_index(sf_dir)
    queries = pa.table(
        {
            "query_id": pa.array([q[0] for q in PINNED_PHRASES], pa.int64()),
            "text": pa.array([q[1] for q in PINNED_PHRASES], pa.string()),
            "k": pa.array([q[2] for q in PINNED_PHRASES], pa.int32()),
        }
    )
    res = dataset_to_table(score_queries(index_dir, queries, kind="phrase"))
    res = res.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    return _round_col(res, "score")


SLOPPY_SLOP = 2
PINNED_SLOPPY = [
    (0, "data table", 10),
    (1, "window key", 10),      # matches "window sort key" at gap 1
    (2, "value a table", 10),
    (3, "value value", 10),
    (4, "zzzabsent table", 10),
]


def q_sloppy_topk(sf_dir: str) -> pa.Table:
    """Slop-scored phrase retrieval (Lucene sloppy-PhraseQuery shape):
    each adjacent query-term pair contributes 2^-gap per position pair
    at gap <= SLOPPY_SLOP (dyadic weights — exact float64 on both
    engines); the phrase scores as a pseudo-term (df = matching docs)
    like phrase_topk."""
    index_dir = ensure_positional_index(sf_dir)
    queries = pa.table(
        {
            "query_id": pa.array([q[0] for q in PINNED_SLOPPY], pa.int64()),
            "text": pa.array([q[1] for q in PINNED_SLOPPY], pa.string()),
            "k": pa.array([q[2] for q in PINNED_SLOPPY], pa.int32()),
        }
    )
    res = dataset_to_table(score_queries(index_dir, queries, kind="sloppy",
                                         window=SLOPPY_SLOP))
    res = res.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    return _round_col(res, "score")


def q_near_topk(sf_dir: str) -> pa.Table:
    """Proximity top-k over the positional index (pinned near set): docs
    containing every query term with each non-anchor term within
    NEAR_WINDOW-1 positions of some occurrence of the first term, scored
    with ordinary summed BM25 over the distinct terms."""
    index_dir = ensure_positional_index(sf_dir)
    queries = pa.table(
        {
            "query_id": pa.array([q[0] for q in PINNED_NEAR], pa.int64()),
            "text": pa.array([q[1] for q in PINNED_NEAR], pa.string()),
            "k": pa.array([q[2] for q in PINNED_NEAR], pa.int32()),
        }
    )
    res = dataset_to_table(
        score_queries(index_dir, queries, kind="near", window=NEAR_WINDOW)
    )
    res = res.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    return _round_col(res, "score")


def q_bm25_topk_and(sf_dir: str) -> pa.Table:
    """Conjunctive (AND) top-k over the plain (non-positional) index:
    docs containing every distinct query term — posting-list
    intersection, rarest term first — scored with ordinary summed BM25
    over the distinct terms. Same pinned query set as bm25_topk, so the
    single-term, absent-term and duplicated-term cases contrast directly
    with the disjunctive results."""
    index_dir = ensure_index(sf_dir)
    queries = pa.table(
        {
            "query_id": pa.array([q[0] for q in PINNED_QUERIES], pa.int64()),
            "text": pa.array([q[1] for q in PINNED_QUERIES], pa.string()),
            "k": pa.array([q[2] for q in PINNED_QUERIES], pa.int32()),
        }
    )
    res = dataset_to_table(score_queries(index_dir, queries, kind="and"))
    res = res.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    return _round_col(res, "score")


# Pinned min_should_match set: 2-of-3 (the interesting middle), 1-of-2
# (== plain disjunctive), 2-of-2 (== AND), 2-of-3 with an absent term,
# and a duplicated term whose single distinct term can't reach m=2
PINNED_MSM = [
    (0, "window sort key", 2, 10),
    (1, "table value", 1, 10),
    (2, "spark merge", 2, 10),
    (3, "window sort zzzabsent", 2, 10),
    (4, "value value", 2, 10),
]


def q_bm25_topk_msm(sf_dir: str) -> pa.Table:
    """min_should_match top-k: disjunctive BM25 restricted to docs
    containing at least ``min_match`` distinct query terms — the dial
    between OR (m=1) and AND (m=n) recall; restriction applied before
    truncation."""
    index_dir = ensure_index(sf_dir)
    queries = pa.table(
        {
            "query_id": pa.array([q[0] for q in PINNED_MSM], pa.int64()),
            "text": pa.array([q[1] for q in PINNED_MSM], pa.string()),
            "min_match": pa.array([q[2] for q in PINNED_MSM], pa.int32()),
            "k": pa.array([q[3] for q in PINNED_MSM], pa.int32()),
        }
    )
    res = dataset_to_table(score_queries(index_dir, queries, kind="msm"))
    res = res.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    return _round_col(res, "score")


def q_prefix_topk(sf_dir: str) -> pa.Table:
    """Wildcard (prefix*) top-k over the plain index: each pinned prefix
    is expanded against the sharded dictionary (row-group-pruned range
    scan per partition) and the expansion is scored as an ordinary
    disjunctive BM25 query — identical to typing every matching term."""
    index_dir = ensure_index(sf_dir)
    queries = pa.table(
        {
            "query_id": pa.array([q[0] for q in PINNED_PREFIXES], pa.int64()),
            "text": pa.array([q[1] for q in PINNED_PREFIXES], pa.string()),
            "k": pa.array([q[2] for q in PINNED_PREFIXES], pa.int32()),
        }
    )
    res = dataset_to_table(score_queries(index_dir, queries, kind="prefix"))
    res = res.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    return _round_col(res, "score")


def q_bm25_topk_wand(sf_dir: str) -> pa.Table:
    """Same pinned queries, WAND forced — the driver gate itself proves
    block-max pruning is rank/score-identical (oracle SQL shared with
    q_bm25_topk)."""
    index_dir = ensure_index(sf_dir)
    res = dataset_to_table(
        score_queries(index_dir, _pinned_queries_table(), mode="wand")
    )
    res = res.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    return _round_col(res, "score")


def q_bm25_topk_incremental(sf_dir: str) -> pa.Table:
    """Split the corpus by doc_id parity, build TWO delta indexes, query
    them FEDERATED (no compaction). Exact BM25 over the union — identical
    to the single-index oracle SQL."""
    from .stages.score import QueryEngine

    outs = _ensure_half_indexes(sf_dir)
    engine = QueryEngine(outs)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text, k in PINNED_QUERIES:
        for r, (d, s) in enumerate(engine.topk(text, k), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(round(s, 6))
    return pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "rank": pa.array(ranks, pa.int32()),
            "doc_id": pa.array(docs, pa.int64()),
            "score": pa.array(scores, pa.float64()),
        }
    )


def _ensure_half_indexes(sf_dir: str) -> list[str]:
    """The two parity-split delta indexes used by the federated queries
    (build is marker-resumable, so repeat callers share the artifacts)."""
    outs = []
    for parity in (0, 1):
        out = _index_dir(sf_dir) + f"-half{parity}"
        ds = documents_as_corpus(sf_dir)

        def keep(batch: pa.Table, parity=parity) -> pa.Table:
            ids = batch.column("doc_id")
            return batch.filter(pc.equal(pc.bit_wise_and(ids, 1), parity))

        build_index(
            ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True),
            out,
            num_partitions=4,
            id_col="doc_id",
            query_lang="simple",
            sample_mod=16,
        )
        outs.append(out)
    return outs


def q_fuzzy_topk_incremental(sf_dir: str) -> pa.Table:
    """Federated fuzzy: the pinned fuzzy query set over the TWO
    parity-split delta indexes, each expanding against its OWN trigram
    artifact — held to the same oracle as single-index fuzzy_topk, so
    per-member expansion + federated scoring is proven identical to
    serving a compacted index."""
    from .pipelines.fuzzy import fuzzy_topk

    outs = _ensure_half_indexes(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text, k in PINNED_FUZZY:
        for r, (d, s) in enumerate(fuzzy_topk(outs, text, k), start=1):
            qids.append(qid)
            ranks.append(r)
            docs.append(d)
            scores.append(s)
    res = pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "rank": pa.array(ranks, pa.int32()),
            "doc_id": pa.array(docs, pa.int64()),
            "score": pa.array(scores, pa.float64()),
        }
    )
    return _round_col(res, "score")


def _pinned_queries_table() -> pa.Table:
    return pa.table(
        {
            "query_id": pa.array([q[0] for q in PINNED_QUERIES], pa.int64()),
            "text": pa.array([q[1] for q in PINNED_QUERIES], pa.string()),
            "k": pa.array([q[2] for q in PINNED_QUERIES], pa.int32()),
        }
    )


def q_term_df(sf_dir: str) -> ray.data.Dataset:
    return analyze.term_df(_docs(sf_dir))


def q_doc_token_counts(sf_dir: str) -> ray.data.Dataset:
    return analyze.doc_token_counts(_docs(sf_dir))


def q_corpus_stats(sf_dir: str) -> pa.Table:
    tbl = analyze.corpus_stats(_docs(sf_dir))
    return _round_col(tbl, "avgdl")


def q_top_terms(sf_dir: str) -> pa.Table:
    tbl = dataset_to_table(analyze.term_df(_docs(sf_dir)))
    tbl = tbl.sort_by([("df", "descending"), ("term", "ascending")])
    return tbl.slice(0, 20)


def q_heavy_hitters(sf_dir: str) -> pa.Table:
    """Exact top-15 terms by occurrence count via the Misra-Gries
    sketch + certified exact recount — two streaming passes with
    O(capacity) per-batch state, no vocabulary-scale shuffle."""
    return analyze.heavy_hitters(
        _docs(sf_dir, columns=("text",)), k=15, capacity=256
    )


def q_top_bigrams(sf_dir: str) -> pa.Table:
    """Global top-20 adjacent token pairs by occurrence count (count desc,
    bigram asc) — per-batch pre-count, one keyed exchange, per-partition
    top-k, driver merges P*k rows only."""
    return analyze.top_bigrams(_docs(sf_dir, columns=("text",)), k=20)


def q_cooccurrence(sf_dir: str) -> pa.Table:
    """Global top-20 distinct-term doc-cooccurrence pairs (n desc, pair
    asc) — vectorized ragged pair expansion per batch, one keyed
    exchange, per-partition top-k, driver merges P*k rows."""
    return analyze.cooccurrence_topk(_docs(sf_dir, columns=("text",)), k=20)


# Pinned RE2 patterns for the distributed regex scan (Arrow and DuckDB
# both use RE2, so engine and oracle match-count semantics agree):
# a match in ~every doc, a zero-match digit run, and an alternation
PINNED_REGEXES = [
    (0, "me[a-z]+e"),
    (1, "[0-9]{3,}"),
    (2, "s(can|ort|low)"),
]


def q_regex_search(sf_dir: str) -> ray.data.Dataset:
    return analyze.regex_search(_docs(sf_dir), PINNED_REGEXES)


def _grep_index_dir(sf_dir: str) -> str:
    key = hashlib.sha256(sf_dir.encode()).hexdigest()[:16]
    return os.path.join(CACHE_ROOT, f"grep-{key}")


def ensure_grep_index(sf_dir: str) -> str:
    """Build (once; marker-resumable) the content-trigram artifact for
    indexed substring/regex search over the documents corpus."""
    from .pipelines.grep import build_content_trigram_index

    return build_content_trigram_index(
        _docs(sf_dir), _grep_index_dir(sf_dir)
    )


# Pinned substring patterns (case-insensitive grep): a word fragment, a
# mid-word fragment, a cross-word fragment with a space (content grams,
# unlike the term dictionary, span token boundaries), an absent string,
# and a sub-trigram pattern (distributed-scan fallback route)
PINNED_SUBSTRINGS = [
    (0, "tab"),
    (1, "alue"),
    (2, "a tab"),
    (3, "zzznope"),
    (4, "ta"),
]

# Pinned indexed-grep regexes: two with an indexable mandatory literal
# ('value', 'wind'), one whose mandatory literal ends at a '+' run
# ('spa' from spa+rk), one absent-literal (proven empty from the gram
# table alone), and one dot-class pattern (scan route)
PINNED_GREP = [
    (0, "value[sd]?"),
    (1, "wind[aeiou]w"),
    (2, "spa+rk"),
    (3, "zzznope[0-9]*"),
    (4, "qu..y"),
]


def q_substring_search(sf_dir: str) -> pa.Table:
    """Code-search substring grep THROUGH THE CONTENT-TRIGRAM INDEX:
    candidates from rarest-window posting intersection, verified by a
    doc_id-pushdown read + vectorized count (never a corpus scan for
    indexable patterns)."""
    from .pipelines.grep import substring_search

    return substring_search(
        _docs(sf_dir),
        ensure_grep_index(sf_dir),
        PINNED_SUBSTRINGS,
        docs_path=f"{sf_dir}/documents.parquet",
    )


def q_grep_indexed(sf_dir: str) -> pa.Table:
    """Regex grep through the content-trigram index (mandatory-literal
    prefilter, RE2 verification on candidates only); patterns without an
    indexable literal fall back to the distributed scan."""
    from .pipelines.grep import regex_search_indexed

    return regex_search_indexed(
        _docs(sf_dir),
        ensure_grep_index(sf_dir),
        PINNED_GREP,
        docs_path=f"{sf_dir}/documents.parquet",
    )


def q_index_stats(sf_dir: str) -> pa.Table:
    """Corpus summary recomputed FROM THE INDEX ARTIFACT (segment scan);
    the oracle recomputes it from the raw documents table, so this row
    is an end-to-end parity check of build/salt/encode."""
    from .pipelines.introspect import index_stats

    return index_stats(ensure_index(sf_dir))


# Pinned autocomplete prefixes: multi-way expansions, a unique-term
# prefix, and an absent prefix
PINNED_SUGGEST = [(0, "s"), (1, "c"), (2, "qu"), (3, "zz"), (4, "b")]


def q_suggest(sf_dir: str) -> pa.Table:
    from .pipelines.introspect import suggest

    return suggest(ensure_index(sf_dir), PINNED_SUGGEST, k=5)


def q_stratified_sample(sf_dir: str) -> ray.data.Dataset:
    """Deterministic balanced subset: up to 10 docs per lang, ranked by
    ascending splitmix64(doc_id) (doc_id asc tie-break) — the per-group
    training-data sampling operator."""
    from .pipelines.sampling import stratified_sample

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"],
        override_num_blocks=8,
    )
    return stratified_sample(ds, key_col="lang", id_col="doc_id", n=10)


def q_content_sha256(sf_dir: str) -> ray.data.Dataset:
    ds = _docs(sf_dir)

    def f(batch: pa.Table) -> pa.Table:
        from .functions.hashing import sha256_hex_column

        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "content_sha256": sha256_hex_column(batch.column("text")),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_exact_dedup(sf_dir: str) -> ray.data.Dataset:
    return dedup.exact_dedup_groups(_docs(sf_dir))


def q_filter_project(sf_dir: str) -> ray.data.Dataset:
    import pyarrow.dataset as pads

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "n_chars"],
        filter=pads.field("lang") == "en",
    )
    return ds


def q_quality_scores(sf_dir: str) -> ray.data.Dataset:
    return analyze.quality_scores(_docs(sf_dir))


def q_dedup_lines(sf_dir: str) -> ray.data.Dataset:
    """Within-doc duplicate-line removal (first occurrence kept)."""
    return analyze.dedup_lines(_docs(sf_dir))


def q_dedup_lines_global(sf_dir: str) -> ray.data.Dataset:
    """Corpus-level line dedup (CCNet-style: only the corpus-wide first
    occurrence of each non-empty line survives; empty lines exempt)."""
    return analyze.dedup_lines_global(_docs(sf_dir))


CHUNK_SIZE = 500   # codepoints per context window (pinned, shared with SQL)
CHUNK_STRIDE = 400  # window step -> 100-codepoint overlap


def q_chunk_docs(sf_dir: str) -> ray.data.Dataset:
    """Context-window chunking of every doc (500-char windows, 400-char
    stride); one row per (doc_id, chunk_id)."""
    return analyze.chunk_docs(
        _docs(sf_dir), size=CHUNK_SIZE, stride=CHUNK_STRIDE
    )


def q_repetition_scores(sf_dir: str) -> ray.data.Dataset:
    return analyze.repetition_scores(_docs(sf_dir))


def q_dup_spans(sf_dir: str) -> ray.data.Dataset:
    """Cross-document duplicated token-8-gram span counts per doc
    (exact-substring dedup signal, Lee et al. 2022)."""
    from .pipelines.spans import duplicated_spans

    return duplicated_spans(_docs(sf_dir), k=8)


def q_pmi_collocations(sf_dir: str) -> pa.Table:
    """Top-20 PMI collocations over adjacent token pairs (min count 5)."""
    return analyze.pmi_collocations(_docs(sf_dir), k=20, min_count=5)


def q_tfidf_keywords(sf_dir: str) -> ray.data.Dataset:
    """Top-5 TF-IDF keywords per doc (integer-exact idf quantization,
    term-asc tie break)."""
    return analyze.tfidf_keywords(_docs(sf_dir), m=5)


def q_remove_dup_spans(sf_dir: str) -> ray.data.Dataset:
    """Apply step of exact-substring dedup: delete every token covered
    by a cross-doc duplicated 8-gram window; emits the surviving token
    stream per doc."""
    from .pipelines.spans import remove_dup_spans

    return remove_dup_spans(_docs(sf_dir), k=8)


def q_winnow_fingerprints(sf_dir: str) -> ray.data.Dataset:
    """Winnowing (MOSS) fingerprint selection: k=5 token grams, w=4
    windows, rightmost-min tie rule; distinct (doc, pos, hash16)."""
    from .pipelines.winnow import winnow_fingerprints

    return winnow_fingerprints(_docs(sf_dir), k=5, w=4)


def q_winnow_matches(sf_dir: str) -> ray.data.Dataset:
    """Doc pairs sharing >= 2 distinct winnowing fingerprints (hashes in
    > 50 docs excluded as boilerplate)."""
    from .pipelines.winnow import winnow_matches

    return winnow_matches(_docs(sf_dir), k=5, w=4, min_shared=2, max_df=50)


def q_redact_pii(sf_dir: str) -> ray.data.Dataset:
    return analyze.redact_pii(_docs(sf_dir))


def q_quality_filter(sf_dir: str) -> ray.data.Dataset:
    return analyze.quality_filter(_docs(sf_dir))


def q_blocklist_filter(sf_dir: str) -> ray.data.Dataset:
    """C4-style banned-term gate over the pinned BLOCKLIST
    (analyze.blocklist_filter)."""
    return analyze.blocklist_filter(_docs(sf_dir))


def q_export_clean(sf_dir: str) -> ray.data.Dataset:
    """The training-data export sink end-to-end: quality gate -> PII
    scrub -> partitioned parquet artifact -> read-back (the returned
    rows are re-read FROM the sink, so the oracle also verifies the
    write path round-trips)."""
    from .pipelines.export import export_clean_corpus

    out = _index_dir(sf_dir) + "-export"
    return export_clean_corpus(_docs(sf_dir), out)


# Pinned mixing rates (permille): keep-all, half, quarter, eighth, drop
PACK_BUDGET = 2000  # tokens per training shard (pinned, shared with SQL)


def q_pack_shards(sf_dir: str) -> ray.data.Dataset:
    """Token-budget shard packing: sequential fill in doc_id order,
    shard = floor(cumsum_before(n_tokens) / budget) — a distributed
    prefix scan (per-range totals -> driver prefix sum -> local scans)."""
    from .pipelines.sampling import pack_shards

    return pack_shards(_docs(sf_dir), budget=PACK_BUDGET)


EPOCH = 1  # pinned epoch for the oracle-gated shuffle query


def q_epoch_shuffle(sf_dir: str) -> ray.data.Dataset:
    """Deterministic per-epoch global training-order shuffle: rank =
    position in (splitmix64(doc_id XOR splitmix64(epoch)), doc_id)
    ascending order (pipelines/sampling.epoch_shuffle — distributed
    rank over the uniform key space, corpus never shuffles)."""
    from .pipelines.sampling import epoch_shuffle

    return epoch_shuffle(_docs(sf_dir, columns=("doc_id",)), epoch=EPOCH)


MIX_RATES = {"en": 1000, "de": 500, "es": 250, "fr": 125, "zh": 0}


def q_mix_sample(sf_dir: str) -> ray.data.Dataset:
    """Corpus mixing: language-weighted deterministic downsampling
    (splitmix64 permille threshold per row) — shuffle-free."""
    from .pipelines.sampling import mix_sample

    return mix_sample(
        _docs(sf_dir, columns=("doc_id", "lang", "text")), MIX_RATES
    )


def q_curate_corpus(sf_dir: str) -> ray.data.Dataset:
    """THE end-to-end training-data curation pipeline, composed from
    the library's own stages: near-dup collapse (cluster survivors,
    adaptive anti-join) -> quality gate -> PII scrub -> partitioned
    parquet export -> read-back. Every stage streams; the only
    materialized state is the cached cluster artifact and the loser-id
    broadcast."""
    from .pipelines.export import export_clean_corpus

    out = _index_dir(sf_dir) + "-curated"
    return export_clean_corpus(q_dedup_survivors(sf_dir), out)


def q_bpe_token_counts(sf_dir: str) -> ray.data.Dataset:
    """Per-doc BPE-ish pretoken counts (LLM token-budget estimation)."""
    return analyze.bpe_token_counts(_docs(sf_dir))


def q_lang_id(sf_dir: str) -> ray.data.Dataset:
    return analyze.language_id(_docs(sf_dir))


# bigram-LM perplexity filter: vocab pruned to top-N terms (the knob that
# bounds the broadcast model at scale); shared with the SQL oracle
LM_VOCAB_SIZE = 256


def q_perplexity(sf_dir: str) -> ray.data.Dataset:
    """Per-doc bigram cross-entropy under an add-one LM trained on the
    same corpus (KenLM-style perplexity quality filter)."""
    from .pipelines.lm import perplexity_scores, train_bigram_lm

    lm = train_bigram_lm(_docs(sf_dir), vocab_size=LM_VOCAB_SIZE)
    return perplexity_scores(_docs(sf_dir), lm)


def q_ccnet_buckets(sf_dir: str) -> ray.data.Dataset:
    """CCNet-style head/middle/tail quality buckets (Wenzek et al.
    2020): per-lang EXACT perplexity tertiles over the bigram-LM
    cross-entropy, integer rank cuts (pipelines/lm.ccnet_buckets)."""
    from .pipelines.lm import ccnet_buckets, train_bigram_lm

    lm = train_bigram_lm(_docs(sf_dir), vocab_size=LM_VOCAB_SIZE)
    return ccnet_buckets(
        _docs(sf_dir, columns=("doc_id", "text", "lang")), lm
    )


def q_ngram_jaccard(sf_dir: str) -> pa.Table:
    tbl = dataset_to_table(
        dedup.ngram_jaccard_pairs(
            _docs(sf_dir), n=JACCARD_N, threshold=JACCARD_THRESHOLD
        )
    )
    return _round_col(tbl, "jaccard")


def ensure_clusters(sf_dir: str) -> str:
    """Build (once; cached like the index) the near-dup CLUSTER TABLE
    artifact: connected components over the exact n-gram-Jaccard pair
    graph, written as partitioned parquet. The cluster assignment is a
    dedup-pass product consumed by several downstream operators
    (survivor filtering, canonical selection), so it gets the same
    build-once treatment as the inverted index."""
    import pyarrow.parquet as pq

    from .pipelines.components import connected_components

    out = _index_dir(sf_dir) + "-clusters"
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        pairs = dedup.ngram_jaccard_pairs(
            _docs(sf_dir), n=JACCARD_N, threshold=JACCARD_THRESHOLD
        )
        tbl = dataset_to_table(connected_components(pairs))
        os.makedirs(out, exist_ok=True)
        pq.write_table(tbl, os.path.join(out, "clusters.parquet"))
        with open(marker, "w") as f:
            f.write("ok")
    return out


# Decontamination: benchmark = docs with doc_id % 64 == 0 (bit-mask
# pushdown at the read), window = 4 tokens (the synthetic vocab is
# small, so 4-grams behave like real-corpus 8-grams)
DECONTAM_MOD = 64
DECONTAM_N = 4


def q_decontaminate(sf_dir: str) -> pa.Table:
    """Benchmark decontamination (the pre-training hygiene op): flag
    every corpus doc sharing at least one token 4-gram with the
    benchmark set, with the count of distinct benchmark grams it
    contains. Benchmark grams are broadcast once (ray.put); the corpus
    side streams with no shuffle."""
    import pyarrow.dataset as pads

    from .pipelines.analyze import decontaminate, distinct_ngrams

    bench = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["text"],
        filter=pc.bit_wise_and(pads.field("doc_id"), DECONTAM_MOD - 1) == 0,
    )
    grams = distinct_ngrams(bench.column("text"), DECONTAM_N)

    def drop_bench(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % DECONTAM_MOD != 0))

    corpus = _docs(sf_dir).map_batches(
        drop_bench, batch_format="pyarrow", zero_copy_batch=True
    )
    res = dataset_to_table(decontaminate(corpus, grams, n=DECONTAM_N))
    return res.sort_by([("doc_id", "ascending")])


def q_dedup_clusters(sf_dir: str) -> ray.data.Dataset:
    """Near-dup cluster assignment: connected components over the exact
    n-gram-Jaccard pair graph (same pairs as `ngram_jaccard`), labelling
    every paired doc with the smallest doc_id in its component plus the
    component size — the "keep one per duplicate cluster" operator.
    Served from the cached cluster-table artifact (ensure_clusters)."""
    return ray.data.read_parquet(
        os.path.join(ensure_clusters(sf_dir), "clusters.parquet")
    )


def ensure_canonical(sf_dir: str) -> str:
    """Build (once; cached inside the clusters artifact) the canonical-
    member table: per cluster, the member with the most tokens (tie:
    smallest doc_id) — cluster_canonical through two keyed exchanges."""
    import pyarrow.parquet as pq

    from .pipelines.components import cluster_canonical

    out = ensure_clusters(sf_dir)
    path = os.path.join(out, "canonical.parquet")
    marker = os.path.join(out, "_CANONICAL_DONE")
    if not os.path.exists(marker):
        clusters = ray.data.read_parquet(os.path.join(out, "clusters.parquet"))
        quality = analyze.doc_token_counts(_docs(sf_dir))
        tbl = dataset_to_table(cluster_canonical(clusters, quality))
        pq.write_table(tbl, path)
        with open(marker, "w") as f:
            f.write("ok")
    return path


def q_cluster_canonical(sf_dir: str) -> ray.data.Dataset:
    """Canonical-doc selection per near-dup cluster: the member with the
    most tokens (tie: smallest doc_id) — composition of dedup_clusters
    with the quality pipeline through two keyed exchanges, served from
    the cached artifact (ensure_canonical)."""
    return ray.data.read_parquet(ensure_canonical(sf_dir))


def q_dedup_survivors(sf_dir: str) -> ray.data.Dataset:
    """THE dedup endpoint: the corpus with near-dup clusters collapsed
    to their canonical member (most tokens, tie smallest doc_id) —
    unclustered docs stream through untouched. ADAPTIVE: the loser set
    (non-canonical cluster members) is counted first; when it fits a
    broadcast (the overwhelmingly common case — dup clusters are sparse)
    the corpus streams through a pc.is_in filter with the loser ids
    shipped once via ray.put, so no text row ever enters an exchange.
    An unbroadcastable loser set falls back to the hash-partitioned
    ANTI-join, where no side is broadcast or driver-materialized.
    When the cluster table is small (parquet metadata row count, no
    scan), the loser set is computed driver-local from the two cached
    artifacts in one pc.is_in — skipping three Ray executions whose
    data wouldn't fill a single block."""
    import pyarrow.parquet as _pq

    from .pipelines.joins import hash_join

    # loser-id sets up to this many rows ship as one broadcast array
    # (8 B/id -> ~80 MB object, well under a worker heap)
    BROADCAST_LOSER_MAX = 10_000_000

    cl_path = os.path.join(ensure_clusters(sf_dir), "clusters.parquet")
    cn_path = ensure_canonical(sf_dir)  # path to canonical.parquet itself
    if _pq.ParquetFile(cl_path).metadata.num_rows <= BROADCAST_LOSER_MAX:
        cl = _pq.read_table(cl_path, columns=["doc_id"])
        cn = _pq.read_table(cn_path, columns=["canonical_doc_id"])
        ids = cl.filter(pc.invert(pc.is_in(
            cl.column("doc_id"),
            value_set=cn.column("canonical_doc_id").combine_chunks(),
        ))).column("doc_id").combine_chunks()
        ref = ray.put(ids)
        corpus = _docs(sf_dir, columns=("doc_id", "lang", "text"))

        def drop_losers_local(b: pa.Table) -> pa.Table:
            import ray as _ray

            keep = pc.invert(pc.is_in(b.column("doc_id"),
                                      value_set=_ray.get(ref)))
            return b.filter(keep)

        return corpus.map_batches(drop_losers_local, batch_format="pyarrow",
                                  zero_copy_batch=True)

    clusters = q_dedup_clusters(sf_dir)
    canon = ray.data.read_parquet(ensure_canonical(sf_dir))

    # losers = cluster members minus canonical winners
    def losers(cpart: pa.Table, wpart: pa.Table) -> pa.Table:
        if cpart.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        import pyarrow.compute as _pc

        keep = _pc.invert(
            _pc.is_in(cpart.column("doc_id"),
                      value_set=wpart.column("canonical_doc_id").combine_chunks())
        )
        return pa.table({"doc_id": cpart.filter(keep).column("doc_id")})

    losers.__name__ = "cluster_losers"
    from .stages.exchange import keyed_cogroup_map

    loser_ids = keyed_cogroup_map(
        clusters.select_columns(["doc_id"]),
        canon.select_columns(["canonical_doc_id"]),
        ["doc_id"], ["canonical_doc_id"], losers,
    ).materialize()  # tiny: bounded by cluster membership, never corpus
    corpus = _docs(sf_dir, columns=("doc_id", "lang", "text"))
    if loser_ids.count() <= BROADCAST_LOSER_MAX:
        ids = dataset_to_table(loser_ids).column("doc_id").combine_chunks()
        ref = ray.put(ids)

        def drop_losers(b: pa.Table) -> pa.Table:
            import ray as _ray

            keep = pc.invert(pc.is_in(b.column("doc_id"),
                                      value_set=_ray.get(ref)))
            return b.filter(keep)

        return corpus.map_batches(drop_losers, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return hash_join(
        corpus, loser_ids,
        left_on="doc_id", right_on="doc_id", how="anti",
    )


def q_minhash_neardup(sf_dir: str) -> pa.Table:
    tbl = dataset_to_table(
        dedup.minhash_neardup_pairs(_docs(sf_dir), n=3, threshold=0.5)
    )
    return _round_col(tbl, "jaccard")


def q_simhash_fingerprints(sf_dir: str) -> ray.data.Dataset:
    return dedup.simhash_fingerprints(_docs(sf_dir))


def q_simhash_neardup(sf_dir: str) -> ray.data.Dataset:
    """All near-dup pairs at Hamming(simhash) <= 3 through the banded-
    bucket path — band count is pigeonhole-derived, so recall at the
    radius is GUARANTEED and the output is exact (shares a brute-force
    Hamming oracle) (pipelines/dedup.simhash_neardup_pairs)."""
    return dedup.simhash_neardup_pairs(_docs(sf_dir), max_hamming=3)


def ensure_simhash_index(sf_dir: str) -> str:
    """Build (once; cached) the incremental SimHash ARTIFACT over the
    corpus partition (doc_id % 8 != 7): pigeonhole band buckets with
    fingerprints in-row (pipelines/dedup.build_simhash_index)."""
    out = _index_dir(sf_dir) + "-simhashindex-v1"
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(out, ignore_errors=True)

        def corpus_rows(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(ids % 8 != 7))

        corpus = _docs(sf_dir).map_batches(
            corpus_rows, batch_format="pyarrow", zero_copy_batch=True
        )
        dedup.build_simhash_index(corpus, out, max_hamming=3)
    return out


def q_simhash_neardup_delta(sf_dir: str) -> ray.data.Dataset:
    """Incremental SimHash near-dup: the delta shard (doc_id % 8 == 7)
    fingerprinted and probed against the persisted corpus band buckets —
    exact cross pairs at Hamming <= 3 without re-reading or
    re-fingerprinting the corpus."""
    from .pipelines.dedup import simhash_neardup_delta

    def delta_rows(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 8 == 7))

    delta = _docs(sf_dir).map_batches(
        delta_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    return simhash_neardup_delta(ensure_simhash_index(sf_dir), delta)


def q_doc_fingerprints(sf_dir: str) -> ray.data.Dataset:
    return analyze.doc_fingerprints(_docs(sf_dir))


def _embeddings(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        override_num_blocks=8,
    )


HYBRID_C = 50  # per-ranker candidate depth feeding RRF
RRF_KRRF = 60
HYBRID_K = 10


def q_hybrid_topk(sf_dir: str) -> pa.Table:
    """HYBRID retrieval: BM25 more-like-this (top-C through the index
    serving path) and embedding-cosine (top-C brute force) fused by
    Reciprocal Rank Fusion, final top-10 per query. Pinned convention:
    ``embeddings.vec_id`` is the embedding of ``documents.doc_id`` (the
    fixture tables are row-aligned). Both candidate sides are the same
    engine paths already gated by their own oracles; the fusion itself
    is a driver-side merge of two C-row lists per query (rrf_fuse)."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from .pipelines.query import rrf_fuse

    index_dir = ensure_index(sf_dir)
    src = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["doc_id", "text"],
        filter=pads.field("doc_id").isin(PINNED_MLT_DOCS),
    )
    queries = pa.table(
        {
            "query_id": src.column("doc_id").cast(pa.int64()),
            "text": src.column("text").cast(pa.string()),
            "k": pa.array([HYBRID_C] * src.num_rows, pa.int32()),
        }
    )
    bm = dataset_to_table(score_queries(index_dir, queries, mode="auto"))

    emb = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    by_id = dict(zip(emb.column("vec_id").to_pylist(),
                     emb.column("embedding").to_pylist()))
    qv = np.asarray([by_id[i] for i in PINNED_MLT_DOCS], dtype=np.float64)
    cos = brute_force_topk(_embeddings(sf_dir), qv, k=HYBRID_C)
    # brute_force_topk query ids are positional -> remap to the pinned docs
    remap = pa.array(
        [PINNED_MLT_DOCS[q] for q in cos.column("query_id").to_pylist()],
        pa.int64(),
    )
    cos = cos.set_column(
        cos.schema.get_field_index("query_id"), "query_id", remap
    ).rename_columns(["query_id", "rank", "doc_id", "cos_sim"])

    fused = rrf_fuse([bm, cos], k_rrf=RRF_KRRF, k=HYBRID_K)
    return _round_col(fused, "rrf")


def q_ann_topk(sf_dir: str) -> pa.Table:
    import pyarrow.parquet as pq

    emb = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    by_id = {
        v: e
        for v, e in zip(emb.column("vec_id").to_pylist(), emb.column("embedding").to_pylist())
    }
    q = np.asarray([by_id[i] for i in ANN_QUERY_IDS], dtype=np.float64)
    res = brute_force_topk(_embeddings(sf_dir), q, k=ANN_K)
    return _round_col(res, "cos_sim")


def q_ann_ivf_topk(sf_dir: str) -> pa.Table:
    """Same pinned ANN queries through the persisted IVF index artifact
    at nprobe = n_lists (exact) — the driver gate itself proves the
    partitioned index returns brute-force-identical results (oracle SQL
    shared with q_ann_topk). Smaller-nprobe recall is pytest-gated."""
    import hashlib as _hl

    import pyarrow.parquet as pq

    from .pipelines.ivf import build_ivf_index, ivf_topk

    out = os.path.join(
        CACHE_ROOT, f"ivf-{_hl.sha256(sf_dir.encode()).hexdigest()[:16]}"
    )
    build_ivf_index(_embeddings(sf_dir), out, n_lists=16, num_partitions=8)
    emb = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    by_id = {
        v: e
        for v, e in zip(emb.column("vec_id").to_pylist(),
                        emb.column("embedding").to_pylist())
    }
    qv = np.asarray([by_id[i] for i in ANN_QUERY_IDS], dtype=np.float64)
    res = ivf_topk(out, qv, k=ANN_K, nprobe=None)
    return _round_col(res, "cos_sim")


def q_ann_graph_topk(sf_dir: str) -> pa.Table:
    """Pinned ANN queries through the persisted NN-DESCENT k-NN GRAPH
    artifact (donkey's kgraph analogue) with beam search. Approximate by
    construction — recorded rows-only; recall >= 0.9 vs brute force is
    gated in pytest (test_knng), and at the fixture scale the beam is
    wide enough to be exact in practice."""
    import hashlib as _hl

    import pyarrow.parquet as pq

    from .pipelines.knng import build_knn_graph, graph_topk

    out = os.path.join(
        CACHE_ROOT, f"knng-{_hl.sha256(sf_dir.encode()).hexdigest()[:16]}"
    )
    build_knn_graph(_embeddings(sf_dir), out, k=16, rounds=2)
    emb = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    by_id = {
        v: e
        for v, e in zip(emb.column("vec_id").to_pylist(),
                        emb.column("embedding").to_pylist())
    }
    qv = np.asarray([by_id[i] for i in ANN_QUERY_IDS], dtype=np.float64)
    res = graph_topk(out, f"{sf_dir}/embeddings.parquet", qv,
                     k=ANN_K, beam=64)
    return _round_col(res, "cos_sim")


def q_graph_topk_recall(sf_dir: str) -> pa.Table:
    """Driver-visible recall GATE for the approximate beam stack
    (VERDICT r2 item 7): the NN-descent graph is force-built by the
    DISTRIBUTED path (local_max_vectors=0 — the artifact the 100 TB
    deployment actually serves), each pinned query runs the beam
    search, and the row asserts |beam top-k ∩ exact brute-force top-k|
    / k >= 0.9. The oracle pins the all-ones assertion table, so a
    recall regression breaks the driver hash — not just a pytest."""
    import hashlib as _hl

    import pyarrow.parquet as pq

    from .pipelines.ann import brute_force_topk
    from .pipelines.knng import build_knn_graph, graph_topk

    out = os.path.join(
        CACHE_ROOT, f"knngnd-{_hl.sha256(sf_dir.encode()).hexdigest()[:16]}"
    )
    build_knn_graph(_embeddings(sf_dir), out, k=16, rounds=2,
                    local_max_vectors=0)
    emb = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    by_id = {
        v: e
        for v, e in zip(emb.column("vec_id").to_pylist(),
                        emb.column("embedding").to_pylist())
    }
    qv = np.asarray([by_id[i] for i in ANN_QUERY_IDS], dtype=np.float64)
    beam = graph_topk(out, f"{sf_dir}/embeddings.parquet", qv,
                      k=ANN_K, beam=64)
    exact = brute_force_topk(_embeddings(sf_dir), qv, k=ANN_K)
    bq = beam.column("query_id").to_numpy(zero_copy_only=False)
    bv = beam.column("vec_id").to_numpy(zero_copy_only=False)
    eq = exact.column("query_id").to_numpy(zero_copy_only=False)
    ev = exact.column("vec_id").to_numpy(zero_copy_only=False)
    ok = []
    for qi in range(len(ANN_QUERY_IDS)):
        want = set(ev[eq == qi].tolist())
        got = set(bv[bq == qi].tolist())
        ok.append(int(len(want & got) >= 0.9 * len(want)))
    return pa.table({
        "query_id": pa.array(range(len(ANN_QUERY_IDS)), pa.int64()),
        "recall_ok": pa.array(ok, pa.int64()),
    })


# Multi-feature object search (donkey A6): query OBJECTS are these
# pinned labels (every vector of the label is one query feature); the
# corpus object of a vector is its label. R pinned at 0.3 — the nearest
# sample pair similarity sits >7e-5 away at sf0.01 (vs ~1e-15 cross-engine
# float noise), so the hit set is rounding-robust.
OBJECT_QUERY_LABELS = [0, 1, 2]
OBJECT_R = 0.3
OBJECT_K = 5


def q_object_search(sf_dir: str) -> pa.Table:
    """Donkey's candidate-grouping + object rerank (A6): per-feature
    cosine hits >= R, grouped per (query object, corpus object), ranked
    by (n_matches desc, max_sim desc, label asc), top-K objects."""
    import pyarrow.compute as _pc
    import pyarrow.parquet as pq

    from .pipelines.ann import object_search

    emb = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )
    qmask = _pc.is_in(emb.column("label"),
                      value_set=pa.array(OBJECT_QUERY_LABELS, pa.int32()))
    qt = emb.filter(qmask)
    q_ids = qt.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
    q_feats = np.asarray(qt.column("embedding").to_pylist(), dtype=np.float64)
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"],
        override_num_blocks=8,
    )
    res = object_search(ds, q_ids, q_feats, threshold=OBJECT_R, k=OBJECT_K)
    return _round_col(res, "max_sim")


def q_embedding_centroids(sf_dir: str) -> pa.Table:
    """Per-label mean embedding (class prototypes) via per-batch partial
    vector sums — only O(labels x dim) doubles leave each worker."""
    from .pipelines.ann import embedding_centroids

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    )
    res = embedding_centroids(ds)
    res = res.sort_by([("label", "ascending"), ("dim", "ascending")])
    return _round_col(res, "v")


def q_embedding_neardup(sf_dir: str) -> pa.Table:
    tbl = embedding_neardup_pairs(
        _embeddings(sf_dir), threshold=NEARDUP_COS_THRESHOLD, exact=True
    )
    return _round_col(tbl, "cos_sim")


def q_dsir_weights(sf_dir: str) -> ray.data.Dataset:
    """DSIR importance weights (Xie et al. 2023): per-doc target-vs-raw
    hashed-unigram log-likelihood ratio, target domain lang='en'
    (pipelines/dsir.py) — the data-selection scorer for building a
    target-like training corpus. Zero shuffles: fixed-B bucket counts
    fold on the driver, scoring is a pure map."""
    from .pipelines.dsir import dsir_weights

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"],
        override_num_blocks=8,
    )
    return dsir_weights(ds, target_lang="en")


def q_sif_embeddings(sf_dir: str) -> ray.data.Dataset:
    """SIF document embeddings (Arora et al. 2017) — pinned integer
    frequency-weighted sign-vector average (pipelines/sif.py); the
    model-free documents -> dense-embedding bridge."""
    from .pipelines.sif import sif_embeddings

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=8,
    )
    return sif_embeddings(ds)


def _kmeans_fit_cached(sf_dir: str) -> list[list[int]]:
    from .pipelines.kmeans import kmeans_fit

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        override_num_blocks=8,
    )
    return kmeans_fit(emb)


def ensure_pq_index(sf_dir: str) -> str:
    """Build (once; resumable artifact) the persisted PQ index over the
    embeddings table (pipelines/pq.build_pq_index)."""
    import hashlib as _hl

    from .pipelines.pq import build_pq_index

    out = os.path.join(
        CACHE_ROOT, f"pq-{_hl.sha256(sf_dir.encode()).hexdigest()[:16]}"
    )
    build_pq_index(_embeddings(sf_dir), out, num_partitions=8)
    return out


def _pq_books_cached(sf_dir: str) -> list[list[list[int]]]:
    from .pipelines.pq import load_pq_books

    return load_pq_books(ensure_pq_index(sf_dir))


def q_pq_codes(sf_dir: str) -> ray.data.Dataset:
    """Product-quantization codes (Jegou et al. 2011): fused per-subspace
    pinned-int k-means codebooks, every vector encoded to M=4 codes of
    K=16 — unnested (vec_id, sub, code) (pipelines/pq.py)."""
    from .pipelines.pq import pq_codes_unnested, pq_encode

    books = _pq_books_cached(sf_dir)
    return pq_codes_unnested(pq_encode(_embeddings(sf_dir), books))


def q_pq_search(sf_dir: str) -> pa.Table:
    """PQ ADC top-k for the pinned ANN queries THROUGH the persisted
    index artifact (books.json + code segments): per-query integer
    distance tables, M lookups per stored code, exact int64 distances
    (pipelines/pq.build_pq_index / pq_index_topk)."""
    import pyarrow.parquet as pq_

    from .pipelines.pq import pq_index_topk

    out = ensure_pq_index(sf_dir)
    emb = pq_.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    by_id = dict(zip(emb.column("vec_id").to_pylist(),
                     emb.column("embedding").to_pylist()))
    qv = np.asarray([by_id[i] for i in ANN_QUERY_IDS], dtype=np.float64)
    return pq_index_topk(out, qv, k=ANN_K)


def ensure_ivfpq_index(sf_dir: str) -> str:
    """Build (once; resumable artifact) the persisted IVF-PQ (IVFADC)
    index over the embeddings table (pipelines/ivfpq.build_ivfpq_index)."""
    import hashlib as _hl

    from .pipelines.ivfpq import build_ivfpq_index

    out = os.path.join(
        CACHE_ROOT, f"ivfpq-{_hl.sha256(sf_dir.encode()).hexdigest()[:16]}"
    )
    build_ivfpq_index(_embeddings(sf_dir), out, num_partitions=4)
    return out


def q_ivfpq_topk(sf_dir: str) -> pa.Table:
    """IVFADC top-k (Jegou et al. 2011 §IV) for the pinned ANN queries
    THROUGH the persisted IVF-PQ artifact: pinned-int coarse quantizer,
    residual PQ codes, nprobe=2-of-4 probed lists, exact integer ADC —
    the probe rule AND the lossy code distances are both mirrored
    bit-for-bit by the DuckDB oracle (pipelines/ivfpq.py)."""
    import pyarrow.parquet as pq_

    from .pipelines.ivfpq import ivfpq_topk

    out = ensure_ivfpq_index(sf_dir)
    emb = pq_.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    by_id = dict(zip(emb.column("vec_id").to_pylist(),
                     emb.column("embedding").to_pylist()))
    qv = np.asarray([by_id[i] for i in ANN_QUERY_IDS], dtype=np.float64)
    return ivfpq_topk(out, qv, k=ANN_K)


def q_kmeans_clusters(sf_dir: str) -> ray.data.Dataset:
    """Pinned-integer Lloyd's k-means over the embeddings table: fit K=4
    centroids (smallest-vec_id init, 4 exact-int iterations), then stream
    the final (vec_id, cluster) assignment (pipelines/kmeans.py)."""
    from .pipelines.kmeans import kmeans_assign

    cents = _kmeans_fit_cached(sf_dir)
    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        override_num_blocks=8,
    )
    return kmeans_assign(emb, cents)


def q_semdedup(sf_dir: str) -> ray.data.Dataset:
    """SemDeDup semantic dedup (Abbas et al. 2023): pinned k-means
    bucketing, then within-cluster any-smaller-id cosine pruning at the
    near-dup threshold; min-id survivor rule (pipelines/kmeans.semdedup)."""
    from .pipelines.kmeans import semdedup

    cents = _kmeans_fit_cached(sf_dir)
    return semdedup(
        _embeddings(sf_dir), cents, threshold=NEARDUP_COS_THRESHOLD
    )


def q_kmeans_centroids(sf_dir: str) -> pa.Table:
    """The fitted k-means centroids unnested to (cluster, dim, c_x1e6) —
    the IVF-coarse-quantizer artifact of the k-means fit."""
    from .pipelines.kmeans import kmeans_centroids_table

    return kmeans_centroids_table(_kmeans_fit_cached(sf_dir))


def q_knn_label_eval(sf_dir: str) -> ray.data.Dataset:
    """Leave-one-out 5-NN label prediction over the labeled embeddings.
    ``index_dir`` arms the IVF-probed large-n path, but at driver scale
    (≤100k labeled rows) the dispatcher takes the pytest-identical
    broadcast tile instead (VERDICT r3 item 8 — no artifact I/O for a
    table under the broadcast budget); the beyond-broadcast plan stays
    gated by test_knn_label_eval_ivf_equals_broadcast(force_ivf=True)."""
    import hashlib as _hl

    from .pipelines.ann import knn_label_eval

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"], override_num_blocks=8,
    )
    out = os.path.join(
        CACHE_ROOT, f"knneval-{_hl.sha256(sf_dir.encode()).hexdigest()[:16]}"
    )
    return knn_label_eval(ds, k=5, index_dir=out)


def q_pca_component(sf_dir: str) -> pa.Table:
    """Dominant principal component of the embeddings table via pinned
    integer power iteration (pipelines/ann.pca_power_iteration) — the
    distributed-PCA primitive for embedding whitening / drift checks."""
    from .pipelines.ann import pca_power_iteration

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"],
        override_num_blocks=8,
    )
    return pca_power_iteration(ds)


def q_pca_residuals(sf_dir: str) -> ray.data.Dataset:
    """All-but-the-top common-direction removal: the pinned PCA
    component's projection subtracted from every embedding
    (pipelines/ann.remove_top_component) — O(dim) closure state, the
    corpus streams shuffle-free."""
    from .pipelines.ann import pca_power_iteration, remove_top_component

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        override_num_blocks=8,
    )
    comp = pca_power_iteration(emb)
    return remove_top_component(emb, comp)


def q_embedding_clusters(sf_dir: str) -> ray.data.Dataset:
    """Semantic dedup clusters: distributed connected components over
    the exact cosine pair graph (the same pairs as embedding_neardup),
    labelling each vector with the min vec_id of its component."""
    from .pipelines.components import connected_components

    pairs_tbl = embedding_neardup_pairs(
        _embeddings(sf_dir), threshold=NEARDUP_COS_THRESHOLD, exact=True
    )
    pairs = ray.data.from_arrow(pairs_tbl.select(["vec_a", "vec_b"]))
    out = connected_components(pairs, a_col="vec_a", b_col="vec_b")

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            ["vec_id" if c == "doc_id" else c for c in batch.column_names])

    return out.map_batches(rename, batch_format="pyarrow",
                           zero_copy_batch=True)


def q_bm25_topk_hydrated(sf_dir: str) -> pa.Table:
    """Top-k results joined back to doc metadata (SURVEY.md B20 —
    broadcast-small-side hydrate, never a shuffle join)."""
    from .pipelines.query import hydrate_results

    index_dir = ensure_index(sf_dir)
    res = dataset_to_table(score_queries(index_dir, _pinned_queries_table()))
    hyd = hydrate_results(res, index_dir)
    hyd = hyd.select(["query_id", "rank", "doc_id", "score", "repo", "path", "lang"])
    hyd = hyd.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    return _round_col(hyd, "score")


def q_collapse_topk(sf_dir: str) -> pa.Table:
    """Field-collapsed top-k over the pinned query set: one (best) result
    per (query, source) group, re-ranked per query — every matching doc
    is scored, collapse happens in a keyed exchange, only the collapsed
    survivors reach the driver."""
    from .pipelines.query import collapse_topk

    index_dir = ensure_index(sf_dir)
    queries = pa.table(
        {
            "query_id": pa.array([q[0] for q in PINNED_QUERIES], pa.int64()),
            "text": pa.array([q[1] for q in PINNED_QUERIES], pa.string()),
            "k": pa.array([q[2] for q in PINNED_QUERIES], pa.int32()),
        }
    )
    res = collapse_topk(
        index_dir, queries, f"{sf_dir}/documents.parquet",
        field="source", k=10,
    )
    res = res.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    return _round_col(res, "score")


def q_filtered_topk(sf_dir: str) -> pa.Table:
    """Metadata-filtered top-k (facet filter lang='en') over the pinned
    query set: filtering happens before truncation via a semi join of
    the full hit set against the read-filtered docs artifact."""
    from .pipelines.query import filtered_topk

    index_dir = ensure_index(sf_dir)
    queries = pa.table(
        {
            "query_id": pa.array([q[0] for q in PINNED_QUERIES], pa.int64()),
            "text": pa.array([q[1] for q in PINNED_QUERIES], pa.string()),
            "k": pa.array([q[2] for q in PINNED_QUERIES], pa.int32()),
        }
    )
    res = filtered_topk(index_dir, queries, field="lang", value="en", k=10)
    res = res.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    return _round_col(res, "score")


def q_facet_counts(sf_dir: str) -> pa.Table:
    """Search-UI facets: per pinned query, the top-50 BM25 results
    counted by lang and by source (repo). Facet labels are the
    documents-table column names so the oracle reads naturally."""
    from .pipelines.query import facet_counts

    index_dir = ensure_index(sf_dir)
    queries = pa.table(
        {
            "query_id": pa.array([q[0] for q in PINNED_QUERIES], pa.int64()),
            "text": pa.array([q[1] for q in PINNED_QUERIES], pa.string()),
            "k": pa.array([50] * len(PINNED_QUERIES), pa.int32()),
        }
    )
    res = dataset_to_table(score_queries(index_dir, queries, mode="auto"))
    out = facet_counts(res, index_dir)
    # repo holds the documents 'source' column (FIXTURES.md section 4)
    facet = pc.replace_substring_regex(
        out.column("facet"), pattern="^repo$", replacement="source"
    )
    out = out.set_column(out.column_names.index("facet"), "facet", facet)
    return out.sort_by(
        [("query_id", "ascending"), ("facet", "ascending"), ("value", "ascending")]
    )


def q_snippets(sf_dir: str) -> pa.Table:
    """Result previews: top-10 BM25 hits per pinned query with a 60-char
    snippet windowed around the earliest query-term occurrence. Text is
    hydrated from the source parquet with a doc_id-pushdown filtered
    read (only the hit rows leave storage)."""
    import pyarrow.dataset as pads

    from .functions.tokenize import get_tokenizer
    from .pipelines.query import snippets

    index_dir = ensure_index(sf_dir)
    res = dataset_to_table(score_queries(index_dir, _pinned_queries_table()))
    res = res.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    tok = get_tokenizer("simple")
    terms = {qid: sorted(set(tok.tokenize(text))) for qid, text, _ in PINNED_QUERIES}
    wanted = pc.unique(res.column("doc_id"))
    texts = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["doc_id", "text"], filter=pads.field("doc_id").isin(wanted)
    )
    out = snippets(res, texts, terms)
    out = out.drop_columns(["score"])
    return out


def q_sample_docs(sf_dir: str) -> ray.data.Dataset:
    """Deterministic hash sample (SURVEY.md B22): ~1/8 of documents by
    splitmix64(doc_id) — identical output at any parallelism. Rows-only
    driver check (the mix function is not reasonably SQL-expressible)."""
    from .functions.hashing import deterministic_sample_mask

    ds = _docs(sf_dir, columns=("doc_id", "text"))

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(deterministic_sample_mask(ids, 8)))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def q_events_window(sf_dir: str) -> pa.Table:
    """Tumbling 1-hour windowed aggregate over the events stream table:
    (window_start, event_type) -> count + sum(value). Windows are derived
    per batch (epoch-truncation), aggregated with the partial-agg keyed
    exchange — the batch-analytics shape of a streaming window."""
    from .stages.exchange import partitioned_aggregate

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"],
        override_num_blocks=8,
    )

    def add_window(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = (ts // 3_600_000_000) * 3_600_000_000
        return pa.table(
            {
                "window_start": pa.array(hour, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "event_type": batch.column("event_type"),
                "value": batch.column("value"),
            }
        )

    win = ds.map_batches(add_window, batch_format="pyarrow", zero_copy_batch=True)
    agg = dataset_to_table(
        partitioned_aggregate(
            win,
            ["window_start", "event_type"],
            [("value", "count"), ("value", "sum")],
            rename={"value_count": "n_events", "value_sum": "sum_value"},
        )
    )
    # quantize float sums to integer x100: double sums differ by 1 ulp
    # between engines depending on summation order, and round(x, 2) can
    # land on different adjacent doubles; integer quantization is stable
    i = agg.column_names.index("sum_value")
    return agg.set_column(
        i, "sum_value_x100",
        pc.round(pc.multiply(agg.column("sum_value"), 100.0)).cast(pa.int64()),
    )


def q_events_sliding(sf_dir: str) -> pa.Table:
    """SLIDING 1-hour windows advancing every 15 minutes (each event
    belongs to exactly 4 windows): the one-row -> W-rows expansion
    happens vectorized inside the batch (numpy repeat + shifted window
    starts) BEFORE the same partial-agg keyed exchange the tumbling
    window uses — input rows are never shuffled, only (window, type)
    partials."""
    from .stages.exchange import partitioned_aggregate

    STEP = 900_000_000  # 15 min in us
    SLOTS = 4  # 1h window / 15min step

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"],
        override_num_blocks=8,
    )

    def expand(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        bucket = (ts // STEP) * STEP
        starts = (
            bucket[:, None] - np.arange(SLOTS, dtype=np.int64)[None, :] * STEP
        ).reshape(-1)
        n = batch.num_rows
        et = batch.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        vals = batch.column("value").to_numpy(zero_copy_only=False)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), SLOTS))
        return pa.table(
            {
                "window_start": pa.array(starts, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "event_type": et.take(idx),
                "value": pa.array(np.repeat(vals, SLOTS), pa.float64()),
            }
        )

    win = ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
    agg = dataset_to_table(
        partitioned_aggregate(
            win,
            ["window_start", "event_type"],
            [("value", "count"), ("value", "sum")],
            rename={"value_count": "n_events", "value_sum": "sum_value"},
        )
    )
    i = agg.column_names.index("sum_value")
    return agg.set_column(
        i, "sum_value_x100",
        pc.round(pc.multiply(agg.column("sum_value"), 100.0)).cast(pa.int64()),
    )


def q_lineitem_rollup(sf_dir: str) -> pa.Table:
    """ROLLUP (l_returnflag, l_linestatus): base cells from the map-side
    combined aggregate, subtotal and grand-total levels derived by
    re-aggregating the |groups|-row base (sums are distributive) — the
    corpus never shuffles twice and rounding happens once at the end."""
    keys = ["l_returnflag", "l_linestatus"]
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=keys + ["l_quantity"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(keys, use_threads=False).aggregate(
            [("l_quantity", "sum"), ("l_quantity", "count")]
        )

    parts = dataset_to_table(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    base = parts.group_by(keys, use_threads=False).aggregate(
        [("l_quantity_sum", "sum"), ("l_quantity_count", "sum")]
    ).rename_columns(keys + ["s", "c"])
    levels = [base]
    lvl1 = base.group_by(["l_returnflag"], use_threads=False).aggregate(
        [("s", "sum"), ("c", "sum")]
    ).rename_columns(["l_returnflag", "s", "c"])
    levels.append(lvl1.append_column(
        "l_linestatus", pa.nulls(lvl1.num_rows, pa.string())
    ).select(["l_returnflag", "l_linestatus", "s", "c"]))
    total_s = pc.sum(base.column("s")).as_py() or 0.0
    total_c = pc.sum(base.column("c")).as_py() or 0
    levels.append(pa.table({
        "l_returnflag": pa.array([None], pa.string()),
        "l_linestatus": pa.array([None], pa.string()),
        "s": pa.array([total_s], pa.float64()),
        "c": pa.array([total_c], pa.int64()),
    }))
    out = pa.concat_tables(
        [lv.select(["l_returnflag", "l_linestatus", "s", "c"]).cast(
            pa.schema([("l_returnflag", pa.string()),
                       ("l_linestatus", pa.string()),
                       ("s", pa.float64()), ("c", pa.int64())])
        ) for lv in levels]
    )
    return pa.table({
        "l_returnflag": out.column("l_returnflag"),
        "l_linestatus": out.column("l_linestatus"),
        "sum_qty_x100": pc.round(
            pc.multiply(out.column("s"), 100.0)).cast(pa.int64()),
        "count_order": out.column("c").cast(pa.int64()),
    })


def q_events_sessions(sf_dir: str) -> ray.data.Dataset:
    """Session windows (30-min gap) per user over the events stream —
    the gaps-and-islands computation as one keyed exchange."""
    from .pipelines.windows import sessionize

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
        override_num_blocks=8,
    )
    return sessionize(ds)


def q_events_in_sessions(sf_dir: str) -> ray.data.Dataset:
    """Keyed interval (range) join: sessions are defined by CLICK events
    only (30-min gap), then EVERY event of the same user joins the click
    session whose [first-click, last-click] interval contains its
    timestamp — one cogroup exchange, vectorized rank-compressed
    containment per partition, no broadcast of either side."""
    from .pipelines.windows import interval_join, session_intervals
    from pyarrow.dataset import field

    clicks = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id"],
        filter=field("event_type") == "click",
        override_num_blocks=8,
    )
    intervals = session_intervals(clicks)
    points = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id"],
        override_num_blocks=8,
    )
    joined = interval_join(points, intervals, point_cols=("event_id",))

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch.column("event_id").cast(pa.int64()),
            "user_id": batch.column("user_id").cast(pa.int64()),
            "session_start": batch.column("lo"),
        })

    return joined.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )


def q_events_running(sf_dir: str) -> pa.Table:
    """Per-user running total of event value in (ts, event_id) order —
    the running window aggregate through one keyed exchange with
    pinned, bit-reproducible accumulation order."""
    from .pipelines.windows import running_total

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
        override_num_blocks=8,
    )
    return dataset_to_table(running_total(ds)).sort_by(
        [("event_id", "ascending")]
    )


def q_value_histogram(sf_dir: str) -> pa.Table:
    """Equal-width histogram of event values (bin width 10): per-batch
    (bin, count) partials, O(bins) driver merge, no shuffle."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["value"], override_num_blocks=8,
    )
    return analyze.histogram(ds, "value", bin_width=10.0)


def q_longest_per_lang(sf_dir: str) -> ray.data.Dataset:
    """Grouped LIMIT: the 3 longest docs (n_chars desc, doc_id asc) per
    language — batch-local top-N pre-prune, then one keyed exchange."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "n_chars"], override_num_blocks=8,
    )
    return analyze.grouped_head(ds, "lang", "n_chars", n=3)


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_pivot(sf_dir: str) -> ray.data.Dataset:
    """Cross-tab: one row per user with one count column per pinned
    event type — map-side pair counts, one keyed exchange, one row per
    key out of each partition."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"],
        override_num_blocks=8,
    )
    return analyze.pivot_counts(ds, "user_id", "event_type", EVENT_TYPES)


FUNNEL_STEPS = ["view", "click", "purchase"]


def q_events_distinct_approx(sf_dir: str) -> pa.Table:
    """Approximate distinct users per event type via mergeable HLL
    register partials (p=12, ~1% typical error) — the sketch shape for
    10^12-row groups where even distinct pairs are too many to shuffle.
    The DuckDB oracle recomputes the IDENTICAL sketch (splitmix64 hash,
    register max, exact-integer harmonic sum, pinned float assembly) in
    SQL; accuracy vs the exact count is additionally pytest-gated."""
    from .pipelines.distinct import approx_distinct_per_group

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"],
        override_num_blocks=8,
    )
    return _round_col(
        approx_distinct_per_group(ds, group_col="event_type", value_col="user_id"),
        "n_distinct_approx",
    )


def q_events_funnel(sf_dir: str) -> pa.Table:
    """Ordered view->click->purchase funnel: per step, the number of
    users whose earliest qualifying occurrence strictly follows their
    previous step's — one keyed exchange, counters-only output."""
    from .pipelines.windows import funnel_counts

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"],
        override_num_blocks=8,
    )
    return funnel_counts(ds, FUNNEL_STEPS)


def q_events_quantiles(sf_dir: str) -> ray.data.Dataset:
    """Exact per-group quantiles (p50/p95 of value per event_type):
    one keyed exchange co-locates each group, then a vectorized sort +
    index pick. Quantile index pinned to DuckDB quantile_disc semantics
    (ceil(q*n) - 1)."""
    from .stages.exchange import keyed_partition_map

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"],
        override_num_blocks=8,
    )

    def quants(part: pa.Table) -> pa.Table:
        empty = pa.table({"event_type": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "p50": pa.array([], pa.float64()),
                          "p95": pa.array([], pa.float64())})
        if part.num_rows == 0:
            return empty
        srt = part.sort_by([("event_type", "ascending"), ("value", "ascending")])
        types = srt.column("event_type").to_numpy(zero_copy_only=False)
        vals = srt.column("value").to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(types[1:] != types[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(types)]))
        n = ends - starts
        i50 = starts + np.maximum(np.ceil(0.5 * n).astype(np.int64) - 1, 0)
        i95 = starts + np.maximum(np.ceil(0.95 * n).astype(np.int64) - 1, 0)
        return pa.table(
            {
                "event_type": pa.array(types[starts], pa.string()),
                "n": pa.array(n, pa.int64()),
                "p50": pa.array(vals[i50], pa.float64()),
                "p95": pa.array(vals[i95], pa.float64()),
            }
        )

    return keyed_partition_map(ds, ["event_type"], quants)


def q_doclen_quantiles(sf_dir: str) -> ray.data.Dataset:
    """Exact per-lang p50/p95 of document token counts — the corpus
    length-profile report. Token counts are computed vectorized per
    batch (only (lang, n_tokens) rows enter the exchange), then the
    same sort + quantile_disc index pick as events_quantiles."""
    from .stages.exchange import keyed_partition_map

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"],
        override_num_blocks=8,
    )

    def lens(batch: pa.Table) -> pa.Table:
        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        from .functions.tokenize import SimpleTokenizer

        _, _, dl = SimpleTokenizer().tokenize_column(col)
        return pa.table(
            {"lang": batch.column("lang"), "n_tokens": pa.array(dl, pa.int64())}
        )

    toks = ds.map_batches(lens, batch_format="pyarrow", zero_copy_batch=True)

    def quants(part: pa.Table) -> pa.Table:
        empty = pa.table({"lang": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "p50": pa.array([], pa.float64()),
                          "p95": pa.array([], pa.float64())})
        if part.num_rows == 0:
            return empty
        srt = part.sort_by([("lang", "ascending"), ("n_tokens", "ascending")])
        langs = srt.column("lang").to_numpy(zero_copy_only=False)
        vals = srt.column("n_tokens").to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(langs[1:] != langs[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(langs)]))
        n = ends - starts
        i50 = starts + np.maximum(np.ceil(0.5 * n).astype(np.int64) - 1, 0)
        i95 = starts + np.maximum(np.ceil(0.95 * n).astype(np.int64) - 1, 0)
        return pa.table(
            {
                "lang": pa.array(langs[starts], pa.string()),
                "n": pa.array(n, pa.int64()),
                "p50": pa.array(vals[i50].astype(np.float64), pa.float64()),
                "p95": pa.array(vals[i95].astype(np.float64), pa.float64()),
            }
        )

    quants.__name__ = "doclen_quantiles"
    return keyed_partition_map(toks, ["lang"], quants)


def q_longest_docs(sf_dir: str) -> pa.Table:
    """Top-100 docs by token count through Ray Data's NATIVE global sort
    (the engine's one all-to-all range-partitioned sort surface — every
    other ranked query uses the per-partition top-k fold, which is the
    preferred scale path; this query pins the native sort path itself).
    Rank is attached to the 100 surviving rows on the driver."""
    from .pipelines.analyze import doc_token_counts

    counts = doc_token_counts(_docs(sf_dir))
    top = counts.sort(["n_tokens", "doc_id"],
                      descending=[True, False]).limit(100)
    tbl = dataset_to_table(top)
    return tbl.append_column(
        "rnk", pa.array(np.arange(1, tbl.num_rows + 1), pa.int64()))


def q_events_anomalies(sf_dir: str) -> ray.data.Dataset:
    """Hourly volume anomalies per event type (|z| >= 2, population
    stddev from exact integer moments)."""
    from .pipelines.windows import hourly_anomalies

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"],
        override_num_blocks=8,
    )
    return hourly_anomalies(ds)


def q_events_retention(sf_dir: str) -> ray.data.Dataset:
    """Cohort-retention matrix: users cohorted by first active epoch-week,
    distinct-user counts per (cohort_week, offset_weeks) cell."""
    from .pipelines.windows import cohort_retention

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"],
        override_num_blocks=8,
    )
    return cohort_retention(ds)


def q_events_distinct_users(sf_dir: str) -> ray.data.Dataset:
    """Exact distinct users per event_type: map-side per-batch dedup then
    one keyed exchange + Arrow count_distinct. The HLL-sketch variant
    (pipelines/distinct.approx_distinct_per_group) is the same shape
    with O(2^p) partials — pytest-gated to ~2% error."""
    from .pipelines.distinct import exact_distinct_per_group

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"],
        override_num_blocks=8,
    )
    return exact_distinct_per_group(
        ds, group_col="event_type", value_col="user_id", out_col="n_users"
    )


def q_lineitem_agg(sf_dir: str) -> pa.Table:
    """Generic columnar aggregate on lineitem, map-side combined: each
    batch pre-aggregates to <= |groups| rows (C++ hash groupby), the
    driver merges the tiny partials — low-cardinality groupbys never pay
    an all-to-all shuffle (and never emit the empty shuffle blocks that
    trip Ray's schema-mismatch warning)."""
    keys = ["l_returnflag", "l_linestatus"]
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=keys + ["l_quantity", "l_extendedprice"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(keys, use_threads=False).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("l_quantity", "count")]
        )

    partials = dataset_to_table(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    tbl = partials.group_by(keys, use_threads=False).aggregate(
        [("l_quantity_sum", "sum"), ("l_extendedprice_sum", "sum"),
         ("l_quantity_count", "sum")]
    )
    out = {k: tbl.column(k) for k in keys}
    out["sum_qty_x100"] = pc.round(
        pc.multiply(tbl.column("l_quantity_sum_sum"), 100.0)
    ).cast(pa.int64())
    out["sum_price_x100"] = pc.round(
        pc.multiply(tbl.column("l_extendedprice_sum_sum"), 100.0)
    ).cast(pa.int64())
    out["count_order"] = tbl.column("l_quantity_count_sum").cast(pa.int64())
    return pa.table(out)


def q_tpch_q3(sf_dir: str) -> pa.Table:
    """TPC-H Q3 shape (shipping priority): BUILDING-segment customers x
    pre-cutoff orders x post-cutoff lineitems, top-10 orders by revenue.
    Revenue is quantized PER ROW to integer cents before summing, so the
    group sum is order-independent and hash-exact cross-engine.

    Scale shape: the segment filter runs at the customer read; both
    joins are the distributed keyed-cogroup hash join (semi-style
    projections — only join keys plus needed columns move); the revenue
    aggregate folds through the partial-agg exchange and only the
    per-partition top-10 survivors reach the driver merge."""
    import pyarrow.dataset as pads

    from .pipelines.joins import hash_join
    from .stages.exchange import partitioned_aggregate

    cutoff = 883_612_800_000_000  # 1998-01-01 in epoch us

    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"],
        filter=pads.field("c_mktsegment") == "BUILDING",
        override_num_blocks=4,
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=pads.field("o_orderdate") < pa.scalar(
            cutoff, pa.timestamp("us")),
        override_num_blocks=8,
    )
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=pads.field("l_shipdate") > pa.scalar(
            cutoff, pa.timestamp("us")),
        override_num_blocks=8,
    )
    co = hash_join(orders, customer, left_on="o_custkey",
                   right_on="c_custkey", how="semi")
    col = hash_join(lineitem, co, left_on="l_orderkey",
                    right_on="o_orderkey", how="inner")

    def revenue_rows(batch: pa.Table) -> pa.Table:
        price = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "l_orderkey": batch.column("l_orderkey").cast(pa.int64()),
            "o_orderdate": batch.column("o_orderdate"),
            "o_orderpriority": batch.column("o_orderpriority"),
            "revenue_x100": pa.array(rev, pa.int64()),
        })

    agg = partitioned_aggregate(
        col.map_batches(revenue_rows, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["l_orderkey", "o_orderdate", "o_orderpriority"],
        [("revenue_x100", "sum")], rename={"revenue_x100_sum": "revenue_x100"},
    )

    def local_top(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part
        return part.sort_by([("revenue_x100", "descending"),
                             ("l_orderkey", "ascending")]).slice(0, 10)

    merged = dataset_to_table(
        agg.map_batches(local_top, batch_format="pyarrow",
                        zero_copy_batch=True))
    return merged.sort_by([("revenue_x100", "descending"),
                           ("l_orderkey", "ascending")]).slice(0, 10)


def q_orders_customer_join(sf_dir: str) -> ray.data.Dataset:
    """Distributed hash join (both sides through one keyed cogroup
    exchange, Arrow C++ join per partition): orders enriched with
    customer name/segment."""
    from .pipelines.joins import hash_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
        override_num_blocks=8,
    )
    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_mktsegment"], override_num_blocks=4,
    )
    return hash_join(orders, customer, left_on="o_custkey",
                     right_on="c_custkey", how="inner")


def q_orders_customer_full(sf_dir: str) -> ray.data.Dataset:
    """Distributed FULL OUTER join with unmatched rows on BOTH sides:
    even-keyed orders vs BUILDING-segment customers. Null emission is
    partition-local (a key hashes to one partition), the key column is
    coalesced across sides."""
    import pyarrow.dataset as pads

    from .pipelines.joins import hash_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
        filter=pc.bit_wise_and(pads.field("o_orderkey"), 1) == 0,
        override_num_blocks=8,
    )
    building = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"],
        filter=pads.field("c_mktsegment") == "BUILDING",
        override_num_blocks=4,
    )
    return hash_join(orders, building, left_on="o_custkey",
                     right_on="c_custkey", how="full")


def q_orders_semi_building(sf_dir: str) -> ray.data.Dataset:
    """Distributed SEMI join: orders whose customer is in the BUILDING
    market segment (right side pre-filtered at the read)."""
    import pyarrow.dataset as pads

    from .pipelines.joins import hash_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderstatus"],
        override_num_blocks=8,
    )
    building = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"],
        filter=pads.field("c_mktsegment") == "BUILDING",
        override_num_blocks=4,
    )
    return hash_join(orders, building, left_on="o_custkey",
                     right_on="c_custkey", how="semi")


def q_events_asof_error(sf_dir: str) -> ray.data.Dataset:
    """AS-OF join: every event gains the timestamp of the same user's
    most recent STRICTLY-EARLIER 'error' event (null if none) — the
    time-series enrichment join Ray Data lacks natively, built on the
    keyed cogroup exchange."""
    import pyarrow.dataset as pads

    from .pipelines.joins import asof_join

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"],
        override_num_blocks=8,
    )
    errors = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"],
        filter=pads.field("event_type") == "error",
        override_num_blocks=4,
    )

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["err_user", "err_ts"])

    errors = errors.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)
    return asof_join(
        events, errors, left_key="user_id", right_key="err_user",
        left_ts="ts", right_ts="err_ts", out_col="last_error_ts",
    )


def q_top_terms_per_lang(sf_dir: str) -> ray.data.Dataset:
    """Grouped top-k: the 5 highest-df terms within each lang (df desc,
    term asc tie-break) — per-group top-k via one keyed exchange, no
    global sort."""
    from .stages.exchange import keyed_partition_map, partitioned_aggregate

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"],
        override_num_blocks=8,
    )

    def explode_distinct(batch: pa.Table) -> pa.Table:
        from .functions.tokenize import SimpleTokenizer

        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat, parents, _dl = SimpleTokenizer().tokenize_column(col)
        langs = batch.column("lang").to_numpy(zero_copy_only=False)
        t = pa.table(
            {"lang": pa.array(langs[parents], pa.string()), "term": flat,
             "row": pa.array(parents, pa.int64())}
        )
        dedup = t.group_by(["row", "lang", "term"], use_threads=False).aggregate([])
        return pa.table({"lang": dedup.column("lang"), "term": dedup.column("term")})

    exploded = ds.map_batches(explode_distinct, batch_format="pyarrow",
                              zero_copy_batch=True)
    df = partitioned_aggregate(
        exploded, ["lang", "term"], [("term", "count")], rename={"term_count": "df"}
    )

    def topk_per_lang(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "term": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int32())})
        srt = part.sort_by([("lang", "ascending"), ("df", "descending"),
                            ("term", "ascending")])
        langs = srt.column("lang").to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(langs[1:] != langs[:-1]) + 1))
        rank = np.arange(len(langs)) - np.repeat(
            starts, np.diff(np.append(starts, len(langs)))
        )
        keep = rank < 5
        out = srt.filter(pa.array(keep))
        return out.append_column(
            "rank", pa.array((rank[keep] + 1).astype(np.int32), pa.int32())
        )

    return keyed_partition_map(df, ["lang"], topk_per_lang)


def flagship(sf_dir: str = "/root/testdata/sf0.001"):
    """entry(): build the index and serve the pinned query set."""
    index_dir = ensure_index(sf_dir)
    queries = pa.table(
        {
            "query_id": pa.array([q[0] for q in PINNED_QUERIES], pa.int64()),
            "text": pa.array([q[1] for q in PINNED_QUERIES], pa.string()),
            "k": pa.array([q[2] for q in PINNED_QUERIES], pa.int32()),
        }
    )
    return score_queries(index_dir, queries, mode="auto")


def ensure_pair_graph(sf_dir: str, threshold: float = JACCARD_THRESHOLD) -> str:
    """Build (once; cached per threshold) the near-dup PAIR GRAPH
    artifact — the exact n-gram-Jaccard pairs written as PARTITIONED
    parquet. Consumed by graph analytics (pagerank, triangle counting)
    without re-running candidate generation + verification."""
    suffix = "" if threshold == JACCARD_THRESHOLD else str(int(threshold * 100))
    out = _index_dir(sf_dir) + "-pairgraph" + suffix
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        pairs = dedup.ngram_jaccard_pairs(
            _docs(sf_dir), n=JACCARD_N, threshold=threshold
        )
        os.makedirs(out, exist_ok=True)
        # partitioned directory, not one giant file (resumable-output rule)
        pairs.write_parquet(os.path.join(out, "pairs"))
        with open(marker, "w") as f:
            f.write("ok")
    return out


def q_pagerank(sf_dir: str) -> ray.data.Dataset:
    """PageRank over the near-dup doc graph (integer parts-per-trillion
    ranks, 10 power iterations): duplicate-hub centrality as a curation
    signal. Iterations are keyed exchanges linear in |edges|; the pair
    graph comes from the cached artifact (ensure_pair_graph) at the
    TIGHT J >= 0.95 threshold — the 0.5 graph on this synthetic corpus
    is near-dense (~8.9M pairs / 5k docs at sf0.1), which is a graph-
    construction choice, not a PageRank scaling property."""
    from .pipelines.graph import pagerank

    pairs = ray.data.read_parquet(
        os.path.join(ensure_pair_graph(sf_dir, threshold=0.95), "pairs"),
        columns=["doc_a", "doc_b"],
    )
    return pagerank(_docs(sf_dir, columns=("doc_id",)), pairs)


def q_events_moving(sf_dir: str) -> pa.Table:
    """Per-user 3-row moving sum of event value (ROWS BETWEEN 2
    PRECEDING AND CURRENT ROW in (ts, event_id) order) — the sliding
    ROWS-frame window function; cents-quantized inputs make the frame
    sums exact integers."""
    from .pipelines.windows import moving_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
        override_num_blocks=8,
    )
    return dataset_to_table(moving_sum(ds)).sort_by([("event_id", "ascending")])


def q_orders_semi_bloom(sf_dir: str) -> ray.data.Dataset:
    """Bloom-prefiltered SEMI join — same rows as orders_semi_building,
    but probe-side rows that cannot match are dropped BEFORE the keyed
    exchange (the 100 TB shuffle-bytes optimization; the exact join
    behind the filter keeps the result identical)."""
    import pyarrow.dataset as pads

    from .pipelines.joins import bloom_semi_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderstatus"],
        override_num_blocks=8,
    )
    building = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"],
        filter=pads.field("c_mktsegment") == "BUILDING",
        override_num_blocks=4,
    )
    return bloom_semi_join(orders, building, left_on="o_custkey",
                           right_on="c_custkey")


def ensure_dedup_index(sf_dir: str) -> str:
    """Build (once; cached) the incremental-dedup ARTIFACT over the
    corpus partition (doc_id % 8 != 7): pinned df rarity order, PPJoin
    prefix postings at the pinned threshold, exact-verify shingle sets
    (pipelines/dedup.build_dedup_index)."""
    out = _index_dir(sf_dir) + "-dedupindex-v2"
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        def corpus_rows(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(ids % 8 != 7))

        corpus = _docs(sf_dir).map_batches(
            corpus_rows, batch_format="pyarrow", zero_copy_batch=True
        )
        dedup.build_dedup_index(
            corpus, out, n=JACCARD_N, threshold=JACCARD_THRESHOLD
        )
    return out


def q_ngram_jaccard_delta(sf_dir: str) -> pa.Table:
    """Incremental dedup: the delta shard (doc_id % 8 == 7) probed
    against the persisted corpus dedup index — exact cross-pair Jaccard
    >= threshold without re-reading corpus text."""
    from .pipelines.dedup import ngram_jaccard_delta

    def delta_rows(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 8 == 7))

    delta = _docs(sf_dir).map_batches(
        delta_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    tbl = dataset_to_table(ngram_jaccard_delta(ensure_dedup_index(sf_dir), delta))
    return _round_col(tbl, "jaccard")


def ensure_minhash_index(sf_dir: str) -> str:
    """Build (once; cached) the incremental MinHash ARTIFACT over the
    corpus partition (doc_id % 8 != 7): persisted LSH band buckets +
    exact-verify shingle sets (pipelines/dedup.build_minhash_index) —
    the corpus is signed once, never per delta probe."""
    out = _index_dir(sf_dir) + "-minhashindex-v2"  # v2: meta.set_values
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(out, ignore_errors=True)

        def corpus_rows(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(ids % 8 != 7))

        corpus = _docs(sf_dir).map_batches(
            corpus_rows, batch_format="pyarrow", zero_copy_batch=True
        )
        dedup.build_minhash_index(corpus, out, n=3, threshold=0.5)
    return out


def q_minhash_neardup_delta(sf_dir: str) -> pa.Table:
    """Incremental MinHash near-dup: the delta shard (doc_id % 8 == 7)
    signed and probed against the persisted corpus band buckets — cross
    pairs sharing >= 1 LSH band, verified by exact shingle Jaccard >=
    threshold, without re-signing or re-reading the corpus."""
    from .pipelines.dedup import minhash_neardup_delta

    def delta_rows(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 8 == 7))

    delta = _docs(sf_dir).map_batches(
        delta_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    tbl = dataset_to_table(
        minhash_neardup_delta(ensure_minhash_index(sf_dir), delta))
    return _round_col(tbl, "jaccard")


def q_events_quantiles_sketch(sf_dir: str) -> ray.data.Dataset:
    """Approximate per-group quantiles from the mergeable 256-bin
    histogram sketch — raw values never shuffle (the 10^12-rows-per-
    group path); integer-exact sketch spec mirrored by the oracle."""
    from .pipelines.distinct import approx_quantiles_per_group

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"],
        override_num_blocks=8,
    )
    return approx_quantiles_per_group(ds)


def q_orders_customer_join_skew(sf_dir: str) -> ray.data.Dataset:
    """Skew-aware inner join (hot keys joined map-side against a
    broadcast right slice, cold keys through the keyed exchange) — held
    to the SAME oracle as orders_customer_join: a different physical
    plan must never be a different answer."""
    from .pipelines.joins import skew_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
        override_num_blocks=8,
    )
    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_mktsegment"],
        override_num_blocks=4,
    )
    # the synthetic custkey distribution is near-uniform; a low threshold
    # forces a non-empty hot set so BOTH plans execute and union
    return skew_join(orders, customer, left_on="o_custkey",
                     right_on="c_custkey", hot_count_threshold=10)


def q_dedup_triangles(sf_dir: str) -> ray.data.Dataset:
    """Triangle count over the tighter (J >= 0.95) near-dup graph — the
    clustering-coefficient signal distinguishing genuine duplicate
    cliques from chained borderline matches; degree-oriented wedge join
    (skew-safe at clique hubs)."""
    from .pipelines.graph import triangle_count

    pairs = ray.data.read_parquet(
        os.path.join(ensure_pair_graph(sf_dir, threshold=0.95), "pairs"),
        columns=["doc_a", "doc_b"],
    )
    return triangle_count(pairs)


def q_events_validate(sf_dir: str) -> ray.data.Dataset:
    """Data-quality expectation gate over events: per-rule violation
    counts (O(rules) output; only the event_id count partials ever
    shuffle)."""
    from .pipelines.validate import validate_events

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "event_type", "value"],
        override_num_blocks=8,
    )
    return validate_events(ds)


def q_orders_customer_join_auto(sf_dir: str) -> ray.data.Dataset:
    """The auto-planned join (pipelines/joins.auto_join): customer is
    small, so the planner picks the zero-exchange broadcast plan — held
    to the same oracle as every other physical plan of this join."""
    from .pipelines.joins import auto_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
        override_num_blocks=8,
    )
    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_mktsegment"], override_num_blocks=4,
    )
    out, plan = auto_join(orders, customer, left_on="o_custkey",
                          right_on="c_custkey", how="inner")
    assert plan == "broadcast", plan
    return out


def q_doclen_percentiles(sf_dir: str) -> ray.data.Dataset:
    """Per-lang percentile rank of every doc's token count — the
    cross-group quality normalization (integer-exact rank arithmetic;
    only (doc_id, lang, n_tokens) rows enter the exchange)."""
    from .pipelines.analyze import doc_token_counts, percentile_rank_per_group

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"],
        override_num_blocks=8,
    )

    def counts(batch: pa.Table) -> pa.Table:
        from .functions.tokenize import SimpleTokenizer

        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        _, _, dl = SimpleTokenizer().tokenize_column(col)
        return pa.table(
            {"doc_id": batch.column("doc_id").cast(pa.int64()),
             "lang": batch.column("lang"),
             "n_tokens": pa.array(dl, pa.int64())}
        )

    projected = docs.map_batches(counts, batch_format="pyarrow",
                                 zero_copy_batch=True)
    return percentile_rank_per_group(
        projected, group_col="lang", value_col="n_tokens"
    )


def q_lineitem_cube(sf_dir: str) -> pa.Table:
    """CUBE (l_returnflag, l_linestatus): all four grouping sets. Base
    cells come from the map-side combined aggregate; every coarser set
    re-aggregates the |groups|-row base (sums are distributive), so the
    corpus shuffles once no matter how many grouping sets emerge."""
    keys = ["l_returnflag", "l_linestatus"]
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=keys + ["l_quantity"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(keys, use_threads=False).aggregate(
            [("l_quantity", "sum"), ("l_quantity", "count")]
        )

    parts = dataset_to_table(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    base = parts.group_by(keys, use_threads=False).aggregate(
        [("l_quantity_sum", "sum"), ("l_quantity_count", "sum")]
    ).rename_columns(keys + ["s", "c"])
    schema = pa.schema([("l_returnflag", pa.string()),
                        ("l_linestatus", pa.string()),
                        ("s", pa.float64()), ("c", pa.int64())])
    levels = [base.select(keys + ["s", "c"])]
    for keep in (["l_returnflag"], ["l_linestatus"]):
        lv = base.group_by(keep, use_threads=False).aggregate(
            [("s", "sum"), ("c", "sum")]
        ).rename_columns(keep + ["s", "c"])
        for missing in keys:
            if missing not in keep:
                lv = lv.append_column(missing, pa.nulls(lv.num_rows, pa.string()))
        levels.append(lv.select(keys + ["s", "c"]))
    levels.append(pa.table({
        "l_returnflag": pa.array([None], pa.string()),
        "l_linestatus": pa.array([None], pa.string()),
        "s": pa.array([pc.sum(base.column("s")).as_py() or 0.0], pa.float64()),
        "c": pa.array([pc.sum(base.column("c")).as_py() or 0], pa.int64()),
    }))
    out = pa.concat_tables([lv.cast(schema) for lv in levels])
    return pa.table({
        "l_returnflag": out.column("l_returnflag"),
        "l_linestatus": out.column("l_linestatus"),
        "sum_qty_x100": pc.round(
            pc.multiply(out.column("s"), 100.0)).cast(pa.int64()),
        "count_order": out.column("c").cast(pa.int64()),
    })


def q_orders_anti_building(sf_dir: str) -> ray.data.Dataset:
    """Bloom-accelerated ANTI join: orders whose customer is NOT in the
    BUILDING segment. Bloom 'definitely absent' probe rows are KEEPS
    that bypass the exchange entirely; only possible members (~matches +
    0.8% FPs) go through the exact anti join — the dual of the semi
    optimization, exact by construction."""
    import pyarrow.dataset as pads

    from .pipelines.joins import bloom_anti_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderstatus"],
        override_num_blocks=8,
    )
    building = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"],
        filter=pads.field("c_mktsegment") == "BUILDING",
        override_num_blocks=4,
    )
    return bloom_anti_join(orders, building, left_on="o_custkey",
                           right_on="c_custkey")


def q_events_delta(sf_dir: str) -> pa.Table:
    """Per-user LAG difference of event value in (ts, event_id) order
    (cents-exact); each user's first event is omitted (null LAG)."""
    from .pipelines.windows import lag_delta

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
        override_num_blocks=8,
    )
    return dataset_to_table(lag_delta(ds)).sort_by([("event_id", "ascending")])


def q_compressibility(sf_dir: str) -> ray.data.Dataset:
    """Compression-ratio quality signal per doc (zlib level 6, pinned;
    rows-only: zlib is not SQL-expressible)."""
    return analyze.compressibility_scores(_docs(sf_dir))


CMS_QUERY_TERMS = ["the", "data", "table", "window", "zzzabsent"]


def q_term_counts_cms(sf_dir: str) -> pa.Table:
    """Count-min-sketch occurrence estimates for the pinned query terms
    (bounded-memory frequency structure; one 64 KiB counter row per
    batch is all that leaves the workers)."""
    from .pipelines.analyze import term_counts_cms

    return term_counts_cms(_docs(sf_dir, columns=("text",)), CMS_QUERY_TERMS)


def q_nb_scores(sf_dir: str) -> ray.data.Dataset:
    """Naive-Bayes holdout classification (pipelines/classify.py): fit
    hashed-unigram NB (target lang='en') on even doc_ids, score the odd
    holdout — (doc_id, score_x1e6, pred, actual). The model-based
    quality/domain filter of the GPT-3/CCNet curation recipe."""
    from .pipelines.classify import nb_scores, nb_train

    ds = _docs(sf_dir, columns=("doc_id", "text", "lang"))
    model = nb_train(ds)
    return nb_scores(_docs(sf_dir, columns=("doc_id", "text", "lang")), model)


def q_nb_confusion(sf_dir: str) -> pa.Table:
    """Holdout confusion matrix of the NB classifier — the eval half of
    model-based filtering: (actual, pred, n), 4 rows."""
    from .pipelines.classify import nb_confusion

    return nb_confusion(q_nb_scores(sf_dir))


def q_stratified_split(sf_dir: str) -> ray.data.Dataset:
    """Exact-proportion 80/10/10 train/val/test split, stratified per
    lang (pipelines/sampling.stratified_split)."""
    from .pipelines.sampling import stratified_split

    return stratified_split(_docs(sf_dir, columns=("doc_id", "lang")))


def q_weighted_sample(sf_dir: str) -> pa.Table:
    """Weighted sampling without replacement (Efraimidis-Spirakis
    exponential keys, weight = n_chars): the 50 winners."""
    from .pipelines.sampling import weighted_sample

    return weighted_sample(
        _docs(sf_dir, columns=("doc_id", "n_chars")), k=50)


def q_jl_project(sf_dir: str) -> ray.data.Dataset:
    """Johnson-Lindenstrauss +-1 projection of the embeddings to 16 dims
    (pipelines/project.py) — the dimensionality-reduction front of the
    ANN stack; exact-int outputs, shuffle-free map."""
    from .pipelines.project import jl_project

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        override_num_blocks=8,
    )
    return jl_project(ds)


def q_token_entropy(sf_dir: str) -> ray.data.Dataset:
    """Per-doc unigram Shannon entropy (pinned exact-integer spec) —
    the low-entropy boilerplate/keyword-stuffing quality signal."""
    from .pipelines.analyze import token_entropy

    return token_entropy(_docs(sf_dir))


# BPE merge count: 10 rounds keeps the unrolled SQL-oracle CTE chain
# tractable while exercising multi-char merges (round 8+ merges a
# 2-char symbol at sf0.01)
BPE_NUM_MERGES = 10


def q_bpe_merges(sf_dir: str) -> pa.Table:
    """Distributed BPE tokenizer training (pipelines/bpe.py): the first
    10 learned merges (merge_round, lhs, rhs, pair_count).  One corpus
    pass for word counts; each round is one vocab-bounded keyed exchange
    + a P-row driver argmax."""
    from .pipelines.bpe import bpe_train

    return bpe_train(_docs(sf_dir), num_merges=BPE_NUM_MERGES)


def q_bpe_encode(sf_dir: str) -> ray.data.Dataset:
    """Per-doc token counts under the learned BPE merges — the encode
    half of the tokenizer: merge table ships once, corpus streams
    through one shuffle-free map."""
    from .pipelines.bpe import bpe_encode_counts, bpe_train

    merges = bpe_train(_docs(sf_dir), num_merges=BPE_NUM_MERGES)
    return bpe_encode_counts(_docs(sf_dir), merges)


def q_prf_topk(sf_dir: str) -> pa.Table:
    """Pseudo-relevance-feedback retrieval: BM25 top-10 feedback docs,
    3 integer-exact tf-idf expansion terms at boost 0.5, one boosted
    re-query (pipelines/query.prf_topk)."""
    from .pipelines.query import prf_topk

    index_dir = ensure_index(sf_dir)
    queries = pa.table(
        {
            "query_id": pa.array([q[0] for q in PINNED_QUERIES], pa.int64()),
            "text": pa.array([q[1] for q in PINNED_QUERIES], pa.string()),
            "k": pa.array([q[2] for q in PINNED_QUERIES], pa.int32()),
        }
    )
    res = prf_topk(
        index_dir, queries, f"{sf_dir}/documents.parquet",
        feedback_docs=10, expansion_terms=3, expansion_weight=0.5, k=10,
    )
    res = res.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    return _round_col(res, "score")


def q_tpch_q5(sf_dir: str) -> pa.Table:
    """TPC-H Q5 shape (local-supplier volume): 1996 revenue per ASIA
    nation counting only lineitems whose supplier sits in the ORDERING
    customer's own nation. Revenue is quantized per row to integer cents
    before summing (order-independent, hash-exact cross-engine).

    Scale shape: region / nation / supplier are dimension tables —
    orders of magnitude smaller than the facts at every TPC-H scale — so
    the ASIA-supplier (suppkey -> nationkey) lookup ships ONCE via
    ray.put and is read zero-copy from each task's local object store,
    never re-shipped per batch. The two fact-to-fact joins
    (orders x customer, lineitem x that) are distributed keyed-cogroup
    hash joins carrying only the key + nationkey columns; the same-nation
    check and cents quantization run vectorized inside the join output's
    map_batches, so only (nationkey, cents) partials — 25 groups — enter
    the final exchange. Date-range and nation filters are pushed into the
    parquet reads."""
    import pyarrow.dataset as pads

    from .pipelines.joins import hash_join
    from .stages.exchange import partitioned_aggregate

    lo = 820_454_400_000_000   # 1996-01-01 epoch us
    hi = 852_076_800_000_000   # 1997-01-01 epoch us

    # dimension side (driver-local reads of the two tiny tables)
    nation = pads.dataset(f"{sf_dir}/nation.parquet").to_table(
        columns=["n_nationkey", "n_name", "n_regionkey"])
    region = pads.dataset(f"{sf_dir}/region.parquet").to_table(
        columns=["r_regionkey", "r_name"])
    asia_rk = region.filter(
        pc.equal(region.column("r_name"), "ASIA")).column("r_regionkey")
    asia_nation = nation.filter(
        pc.is_in(nation.column("n_regionkey"), value_set=asia_rk))
    asia_keys = asia_nation.column("n_nationkey")
    supplier = pads.dataset(f"{sf_dir}/supplier.parquet").to_table(
        columns=["s_suppkey", "s_nationkey"],
        filter=pads.field("s_nationkey").isin(asia_keys.to_pylist()),
    )
    sk = supplier.column("s_suppkey").to_numpy(zero_copy_only=False)
    sn = supplier.column("s_nationkey").to_numpy(zero_copy_only=False)
    order = np.argsort(sk, kind="stable")
    supp_ref = ray.put((sk[order].astype(np.int64),
                        sn[order].astype(np.int64)))

    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"],
        filter=pads.field("c_nationkey").isin(asia_keys.to_pylist()),
        override_num_blocks=4,
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
        filter=(pads.field("o_orderdate") >= pa.scalar(lo, pa.timestamp("us")))
        & (pads.field("o_orderdate") < pa.scalar(hi, pa.timestamp("us"))),
        override_num_blocks=8,
    )
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        override_num_blocks=8,
    )

    oc = hash_join(orders, customer, left_on="o_custkey",
                   right_on="c_custkey", how="inner")
    loj = hash_join(lineitem, oc, left_on="l_orderkey",
                    right_on="o_orderkey", how="inner")

    def local_rev(batch: pa.Table) -> pa.Table:
        skey, snat = ray.get(supp_ref)  # local-store cached, zero-copy
        ls = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        cn = batch.column("c_nationkey").to_numpy(zero_copy_only=False)
        if len(skey) == 0:  # no qualifying suppliers at all
            empty = np.array([], np.int64)
            return pa.table({"n_nationkey": pa.array(empty, pa.int64()),
                             "revenue_x100": pa.array(empty, pa.int64())})
        pos_c = np.minimum(np.searchsorted(skey, ls), len(skey) - 1)
        nat = snat[pos_c]
        keep = (skey[pos_c] == ls) & (nat == cn)
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "n_nationkey": pa.array(nat[keep], pa.int64()),
            "revenue_x100": pa.array(rev[keep], pa.int64()),
        })

    agg = partitioned_aggregate(
        loj.map_batches(local_rev, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["n_nationkey"],
        [("revenue_x100", "sum")], rename={"revenue_x100_sum": "revenue_x100"},
    )
    tbl = dataset_to_table(agg)
    names = {
        k: v for k, v in zip(
            asia_nation.column("n_nationkey").to_pylist(),
            asia_nation.column("n_name").to_pylist())
    }
    out = pa.table({
        "n_name": pa.array(
            [names[k] for k in tbl.column("n_nationkey").to_pylist()],
            pa.string()),
        "revenue_x100": tbl.column("revenue_x100").cast(pa.int64()),
    })
    return out.sort_by([("revenue_x100", "descending"),
                        ("n_name", "ascending")])


def q_sorted_topk(sf_dir: str) -> pa.Table:
    """Field-SORTED retrieval over the pinned query set: matching docs
    ranked by n_chars (longest first, ties doc_id asc) instead of BM25 —
    the search-UI "sort by length/date" mode
    (pipelines/query.sort_by_field_topk)."""
    from .pipelines.query import sort_by_field_topk

    index_dir = ensure_index(sf_dir)
    queries = pa.table(
        {
            "query_id": pa.array([q[0] for q in PINNED_QUERIES], pa.int64()),
            "text": pa.array([q[1] for q in PINNED_QUERIES], pa.string()),
            "k": pa.array([q[2] for q in PINNED_QUERIES], pa.int32()),
        }
    )
    res = sort_by_field_topk(index_dir, queries, field="n_chars", k=10)
    return res.sort_by([("query_id", "ascending"), ("rank", "ascending")])


def q_dedup_degree(sf_dir: str) -> ray.data.Dataset:
    """Degree histogram of the tight (J >= 0.95) near-dup graph: how
    many docs have 1, 2, ... near-duplicates — the cluster-size profile
    used to pick dedup thresholds (pipelines/graph.degree_histogram;
    pair graph served from the cached pairgraph artifact)."""
    from .pipelines.graph import degree_histogram

    pairs = ray.data.read_parquet(
        os.path.join(ensure_pair_graph(sf_dir, threshold=0.95), "pairs"),
        columns=["doc_a", "doc_b"],
    )
    return degree_histogram(pairs)


def q_ann_sharded_topk(sf_dir: str) -> pa.Table:
    """Pinned ANN queries through the SHARDED k-NN graph (the 100 TB
    serving shape: disjoint hash shards, one resident server actor per
    shard, fan-out/merge). Each shard is built by the exact local path
    at this scale, and a disjoint cover of exact per-shard answers is
    globally exact — so this shares the brute-force SQL oracle, proving
    the sharded plumbing end-to-end (pipelines/knng)."""
    import hashlib as _hl

    import pyarrow.parquet as pq

    from .pipelines.knng import build_sharded_knn_graph, sharded_graph_topk

    out = os.path.join(
        CACHE_ROOT, f"sknng-{_hl.sha256(sf_dir.encode()).hexdigest()[:16]}"
    )
    build_sharded_knn_graph(_embeddings(sf_dir), out, n_shards=3, k=16,
                            rounds=2)
    emb = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    by_id = {
        v: e
        for v, e in zip(emb.column("vec_id").to_pylist(),
                        emb.column("embedding").to_pylist())
    }
    qv = np.asarray([by_id[i] for i in ANN_QUERY_IDS], dtype=np.float64)
    res = sharded_graph_topk(out, f"{sf_dir}/embeddings.parquet", qv,
                             k=ANN_K, beam=64)
    return _round_col(res, "cos_sim")


def q_corpus_report(sf_dir: str) -> pa.Table:
    """The one-row corpus report card (pre-training data audit):
    exact doc/lang/token/vocab/dup/median-length numbers composed from
    the library's own bounded-partial passes (pipelines/analyze
    .corpus_report)."""
    return analyze.corpus_report(
        _docs(sf_dir, columns=("doc_id", "text", "lang")))


def q_tpch_q10(sf_dir: str) -> pa.Table:
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    1996-Q4 revenue from RETURNED lineitems, with name and nation.
    Revenue quantized per row to integer cents (order-independent sum).

    Scale shape: both fact filters push into the parquet reads; the
    l x o join is the keyed-cogroup hash join carrying only keys; the
    per-customer partial aggregate runs BEFORE the customer join, so the
    (large) customer table joins against at most one row per customer;
    nation ships once as a driver-local name map; per-partition top-20
    fold, driver merges survivors only."""
    import pyarrow.dataset as pads

    from .pipelines.joins import hash_join
    from .stages.exchange import partitioned_aggregate

    lo = 844_128_000_000_000   # 1996-10-01 epoch us
    hi = 852_076_800_000_000   # 1997-01-01 epoch us

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
        filter=(pads.field("o_orderdate") >= pa.scalar(lo, pa.timestamp("us")))
        & (pads.field("o_orderdate") < pa.scalar(hi, pa.timestamp("us"))),
        override_num_blocks=8,
    )
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pads.field("l_returnflag") == "R",
        override_num_blocks=8,
    )
    loj = hash_join(lineitem, orders, left_on="l_orderkey",
                    right_on="o_orderkey", how="inner")

    def rev_rows(batch: pa.Table) -> pa.Table:
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "o_custkey": batch.column("o_custkey").cast(pa.int64()),
            "revenue_x100": pa.array(rev, pa.int64()),
        })

    agg = partitioned_aggregate(
        loj.map_batches(rev_rows, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["o_custkey"],
        [("revenue_x100", "sum")], rename={"revenue_x100_sum": "revenue_x100"},
    )
    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"], override_num_blocks=4,
    )
    joined = hash_join(agg, customer, left_on="o_custkey",
                       right_on="c_custkey", how="inner")

    def local_top(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part
        return part.sort_by([("revenue_x100", "descending"),
                             ("o_custkey", "ascending")]).slice(0, 20)

    merged = dataset_to_table(
        joined.map_batches(local_top, batch_format="pyarrow",
                           zero_copy_batch=True))
    merged = merged.sort_by([("revenue_x100", "descending"),
                             ("o_custkey", "ascending")]).slice(0, 20)
    import pyarrow.dataset as pads2

    nation = pads2.dataset(f"{sf_dir}/nation.parquet").to_table(
        columns=["n_nationkey", "n_name"])
    names = dict(zip(nation.column("n_nationkey").to_pylist(),
                     nation.column("n_name").to_pylist()))
    return pa.table({
        "c_custkey": merged.column("o_custkey").cast(pa.int64()),
        "c_name": merged.column("c_name").cast(pa.string()),
        "n_name": pa.array(
            [names[k] for k in merged.column("c_nationkey").to_pylist()],
            pa.string()),
        "revenue_x100": merged.column("revenue_x100").cast(pa.int64()),
    })


# donkey A6 threshold: only candidates scoring >= R survive (rounded to
# 6 digits on both engines before the comparison)
THRESHOLD_R = 0.5


def q_threshold_topk(sf_dir: str) -> pa.Table:
    """Donkey's R-threshold retrieval: BM25 hits below R are dropped
    before ranking, so weak-match pages come back SHORT instead of
    padded with noise (pipelines/query.threshold_topk)."""
    from .pipelines.query import threshold_topk

    index_dir = ensure_index(sf_dir)
    queries = pa.table(
        {
            "query_id": pa.array([q[0] for q in PINNED_QUERIES], pa.int64()),
            "text": pa.array([q[1] for q in PINNED_QUERIES], pa.string()),
            "k": pa.array([q[2] for q in PINNED_QUERIES], pa.int32()),
        }
    )
    res = threshold_topk(index_dir, queries, r=THRESHOLD_R, k=10)
    res = res.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    return _round_col(res, "score")


def q_grouped_split(sf_dir: str) -> ray.data.Dataset:
    """Group-aware 80/10/10 split by source (leakage prevention: all of
    a source's docs share one split; pipelines/sampling.grouped_split)."""
    from .pipelines.sampling import grouped_split

    return grouped_split(_docs(sf_dir, columns=("doc_id", "source")))


# ---- multimodal driver contract (VERDICT r3 item 2) ----
#
# A deterministic seeded media fixture generated with functions/media.py's
# round-trip-proven encoders: every doc_id ≡ 0 (mod MEDIA_DOC_MOD) in the
# documents table gets a 16x16 24-bit BMP whose pixel (y, x, c) is the
# pinned integer spec (doc_id*7 + y*31 + x*13 + c*97) % 256, and a mono
# 16-bit WAV whose sample i is ((doc_id*31 + i*i*7) % 1449) - 724. Both
# specs are closed-form in the table columns, so the DuckDB oracle
# computes the SAME values WITHOUT any codec — while the Ray side round-
# trips real BMP/WAV bytes through stages/multimodal.py's REAL decode
# paths (magic-byte sniff -> decode_bmp / stdlib wave).
#
# The WAV samples are clamped to [-724, 724] ON PURPOSE: band energy =
# Σ(v/32768)² over 7 samples is then EXACT in float32 (every term is a
# multiple of 2⁻³⁰ and the running sum spans ≤23 mantissa bits), so the
# fingerprint's double-delta sign decisions match the oracle's integer
# arithmetic bit-for-bit.

MEDIA_DOC_MOD = 7
MEDIA_IMG_SIDE = 16
MEDIA_WAV_SAMPLES = 2048


def _media_corpus(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, image:binary, audio:binary) for the sampled doc_ids —
    encoders run distributed in map_batches; nothing driver-resident."""
    import numpy as np

    from .functions import media as mediacodec

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        ids = ids[ids % MEDIA_DOC_MOD == 0]
        side = MEDIA_IMG_SIDE
        y, x, c = np.meshgrid(np.arange(side), np.arange(side),
                              np.arange(3), indexing="ij")
        i = np.arange(MEDIA_WAV_SAMPLES, dtype=np.int64)
        # pixel / sample synthesis vectorized across the whole batch
        # (one broadcast per batch, int64-exact: ids are dense small
        # ints); only the byte-container encode remains per doc
        ids64 = ids.astype(np.int64)
        rgb_all = ((ids64[:, None, None, None] * 7 + y * 31 + x * 13
                    + c * 97) % 256).astype(np.uint8)
        wav_all = ((ids64[:, None] * 31 + i * i * 7) % 1449 - 724
                   ).astype(np.int16)
        # alternate REAL containers (BMP / stdlib-zlib PNG) so the same
        # pixel-sum oracle hash-gates BOTH decode paths end-to-end; the
        # pixel formula (and hence the oracle) is container-independent
        imgs = [mediacodec.encode_png(r) if (d // MEDIA_DOC_MOD) % 2
                else mediacodec.encode_bmp(r)
                for d, r in zip(ids64, rgb_all)]
        wavs = [mediacodec.encode_wav(v) for v in wav_all]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "image": pa.array(imgs, pa.binary()),
            "audio": pa.array(wavs, pa.binary()),
        })

    return ds.map_batches(gen, batch_format="pyarrow", zero_copy_batch=True)


def q_media_pixel_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-channel integer pixel sums of the REAL-decoded BMP fixture:
    media bytes -> stages/multimodal.ImageDecodeStage actor pool (magic
    sniff -> functions/media.decode_bmp; native 16x16 so resize is
    identity) -> vectorized channel sums. Hash-gates the real image
    decode path end-to-end."""
    import numpy as np

    from .stages.multimodal import decode_images

    media = _media_corpus(sf_dir).select_columns(["doc_id", "image"])

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["doc_id", "media"])

    decoded = decode_images(
        media.map_batches(rename, batch_format="pyarrow",
                          zero_copy_batch=True),
        height=MEDIA_IMG_SIDE, width=MEDIA_IMG_SIDE)

    def sums(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        side = MEDIA_IMG_SIDE
        flat = np.asarray(
            batch.column("pixels").combine_chunks().flatten().to_numpy(
                zero_copy_only=False),
            dtype=np.int64).reshape(n, side * side, 3)
        s = flat.sum(axis=1)  # (n, 3) channel sums
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "sum_r": pa.array(s[:, 0], pa.int64()),
            "sum_g": pa.array(s[:, 1], pa.int64()),
            "sum_b": pa.array(s[:, 2], pa.int64()),
        })

    sums.__name__ = "media_pixel_sums"
    return decoded.map_batches(sums, batch_format="pyarrow",
                               zero_copy_batch=True)


def q_audio_fingerprints(sf_dir: str) -> ray.data.Dataset:
    """Chromaprint-style sub-fingerprints of the REAL-decoded WAV
    fixture: media bytes -> stages/multimodal.AudioFingerprintStage
    actor pool (RIFF sniff -> stdlib wave decode -> 33-band double-delta
    binarization) -> one row per (doc_id, win). Bit-exact vs the
    oracle's integer arithmetic (see the float32 note above)."""
    from .stages.multimodal import audio_fingerprints

    media = _media_corpus(sf_dir).select_columns(["doc_id", "audio"])

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["doc_id", "media"])

    fps = audio_fingerprints(
        media.map_batches(rename, batch_format="pyarrow",
                          zero_copy_batch=True))

    def unnest(batch: pa.Table) -> pa.Table:
        # list-column explode via Arrow kernels (no to_pylist row loop):
        # flatten + repeat-by-length, win = global slot - list start
        import numpy as np
        import pyarrow.compute as pc

        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "win": pa.array([], pa.int32()),
                          "fp": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty  # np.repeat((1,), (0,)) would raise below
        col = batch.column("fp")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = pc.list_value_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        total = int(lens.sum())
        ids64 = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids64, lens), pa.int64()),
            "win": pa.array(
                (np.arange(total, dtype=np.int64)
                 - np.repeat(starts, lens)).astype(np.int32), pa.int32()),
            "fp": col.flatten().cast(pa.int64()),
        })

    unnest.__name__ = "fp_unnest"
    return fps.map_batches(unnest, batch_format="pyarrow",
                           zero_copy_batch=True)
