"""Pinned analyzers (s-stemmer + accent fold): rule goldens,
vectorized/row parity, SQL-spec parity, and end-to-end index tests."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from donkey_ray.functions.tokenize import (
    StemTokenizer,
    get_tokenizer,
    s_stem,
    s_stem_array,
    stem_sql,
)

GOLDENS = {
    # rule 1: ies -> y (not after e/a, needs TWO preceding chars)
    "queries": "query", "tables": "table", "aies": "aie", "eies": "eie",
    "ies": "ie",
    # 4-letter -ies words have only ONE char before "ies": rule 1 cannot
    # fire, they fall through to rule 2 (pinned spec)
    "dies": "die", "ties": "tie",
    # rule 2: es -> e (not aes/ees/oes)
    "classes": "classe", "merges": "merge", "goes": "goe", "sees": "see",
    # rule 3: drop s (not us/ss, needs 2 preceding chars)
    "dogs": "dog", "windows": "window", "bus": "bus", "miss": "miss",
    "as": "as", "is": "is",
    # untouched
    "value": "value", "query": "query", "x": "x", "42": "42",
}


def test_stem_goldens_row():
    for tok, want in GOLDENS.items():
        assert s_stem(tok) == want, tok


def test_stem_vectorized_matches_row():
    toks = list(GOLDENS)
    out = s_stem_array(pa.array(toks, pa.string())).to_pylist()
    assert out == [GOLDENS[t] for t in toks]


def test_stem_sql_matches_engine():
    """The DuckDB expression built by stem_sql IS the same spec."""
    toks = list(GOLDENS)
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT {stem_sql('t')} FROM (SELECT unnest(?) AS t)", [toks]
    ).fetchall()
    assert [r[0] for r in rows] == [GOLDENS[t] for t in toks]


def test_stem_tokenizer_registered_and_consistent():
    tok = get_tokenizer("stem")
    assert isinstance(tok, StemTokenizer)
    texts = ["Queries against TABLES return values", "", "keys keys keys"]
    flat, parents, dl = tok.tokenize_column(pa.array(texts, pa.string()))
    per_row = [tok.tokenize(t) for t in texts]
    assert flat.to_pylist() == [t for row in per_row for t in row]
    assert list(dl) == [len(r) for r in per_row]
    assert per_row[0] == ["query", "against", "table", "return", "value"]


def test_stemmed_index_end_to_end(ray_session, tmp_path):
    """Build a stem-analyzed index over a plural-bearing corpus; plural
    AND singular queries must retrieve the same docs with identical BM25
    scores, matching the brute-force oracle with lang='stem'."""
    import ray.data

    from donkey_ray.oracle import BM25Oracle
    from donkey_ray.pipelines.build import build_index
    from donkey_ray.pipelines.query import score_queries
    from donkey_ray.util import dataset_to_table

    texts = [
        "tables store values",            # plurals
        "the table stores a value",       # singulars ("stores" -> "store")
        "queries scan tables and keys",
        "query planning for key lookup",
        "windows and sort keys",
        "miss bus chaos",                 # us/ss exceptions survive
    ]
    corpus = pa.table({
        "repo": pa.array(["r"] * len(texts)),
        "path": pa.array([f"f{i}" for i in range(len(texts))]),
        "commit": pa.array(["c"] * len(texts)),
        "lang": pa.array(["stem"] * len(texts)),
        "content": pa.array(texts),
    })
    out = str(tmp_path / "stemidx")
    meta = build_index(ray.data.from_arrow(corpus), out, num_partitions=4,
                       query_lang="stem", detect_hot=False)
    assert meta["query_lang"] == "stem"
    oracle = BM25Oracle.from_corpus(corpus)

    qtbl = pa.table({
        "query_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["tables", "table", "values keys", "miss"], pa.string()),
        "k": pa.array([10, 10, 10, 10], pa.int32()),
    })
    res = dataset_to_table(score_queries(out, qtbl, mode="exact"))
    got = {}
    for r in res.to_pylist():
        got.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, text in [(0, "tables"), (1, "table"), (2, "values keys"), (3, "miss")]:
        want = oracle.topk(text, 10, lang="stem")
        have = sorted(got.get(qid, []), key=lambda p: (-p[1], p[0]))
        assert [d for d, _ in have] == [d for d, _ in want], (qid, text)
        np.testing.assert_allclose([s for _, s in have], [s for _, s in want],
                                   rtol=0, atol=1e-9)
    # plural and singular query hit the SAME docs (unification is real)
    assert [d for d, _ in got[0]] == [d for d, _ in got[1]]
    scores0 = dict(got[0])
    assert scores0 == dict(got[1])
    # both the plural-bearing doc 0 and the singular-bearing doc 1 hit
    from donkey_ray.functions.hashing import doc_id_from_key

    hash_ids = {doc_id_from_key("r", f"f{i}", "c") for i in (0, 1)}
    assert hash_ids <= set(scores0)


def test_stemmed_index_overrides_doc_lang(ray_session, tmp_path):
    """REGRESSION (review finding): docs whose lang column is NOT 'stem'
    (the real-corpus case — documents carry 'en'/'es'/...) must still be
    index-side stemmed when the index is built with analyzer_lang='stem';
    without the override the index holds literal plurals and the stemmed
    query misses them."""
    import ray.data

    from donkey_ray.functions.hashing import doc_id_from_key
    from donkey_ray.pipelines.build import build_index
    from donkey_ray.pipelines.query import score_queries
    from donkey_ray.util import dataset_to_table

    corpus = pa.table({
        "repo": pa.array(["r", "r"]),
        "path": pa.array(["plural", "singular"]),
        "commit": pa.array(["c", "c"]),
        "lang": pa.array(["en", "es"]),   # NOT 'stem'
        "content": pa.array(["tables store values", "the table is here"]),
    })
    out = str(tmp_path / "stemidx_en")
    meta = build_index(ray.data.from_arrow(corpus), out, num_partitions=2,
                       query_lang="stem", analyzer_lang="stem",
                       detect_hot=False)
    assert meta["analyzer_lang"] == "stem"
    qtbl = pa.table({
        "query_id": pa.array([0], pa.int64()),
        "text": pa.array(["table"], pa.string()),
        "k": pa.array([10], pa.int32()),
    })
    res = dataset_to_table(score_queries(out, qtbl, mode="exact"))
    hit_ids = set(res.column("doc_id").to_pylist())
    want = {doc_id_from_key("r", "plural", "c"),
            doc_id_from_key("r", "singular", "c")}
    assert want <= hit_ids  # the plural-bearing 'en' doc matches too


# ------------------------------------------------------- accent folding


FOLD_GOLDENS = {
    "Résumé": ["resume"],
    "Straße": ["strasse"],
    "naïve café": ["naive", "cafe"],
    "øre señor": ["ore", "senor"],
    "Ünïcode-Špliš": ["unicode", "splis"],
    "plain ascii 42": ["plain", "ascii", "42"],
    "中文 stays separator": ["stays", "separator"],
}


def test_fold_goldens_row_and_column():
    from donkey_ray.functions.tokenize import FoldTokenizer

    tok = FoldTokenizer()
    texts = list(FOLD_GOLDENS)
    for t, want in FOLD_GOLDENS.items():
        assert tok.tokenize(t) == want, t
    flat, parents, dl = tok.tokenize_column(pa.array(texts, pa.string()))
    per_row = [FOLD_GOLDENS[t] for t in texts]
    assert flat.to_pylist() == [w for row in per_row for w in row]
    assert list(dl) == [len(r) for r in per_row]


def test_fold_sql_matches_engine():
    from donkey_ray.functions.tokenize import fold_sql, fold_text

    texts = list(FOLD_GOLDENS)
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT {fold_sql('t')} FROM (SELECT unnest(?) AS t)", [texts]
    ).fetchall()
    assert [r[0] for r in rows] == [fold_text(t) for t in texts]


def test_folded_index_end_to_end(ray_session, tmp_path):
    """Accented and plain spellings unify under query_lang='fold'."""
    import ray.data

    from donkey_ray.functions.hashing import doc_id_from_key
    from donkey_ray.oracle import BM25Oracle
    from donkey_ray.pipelines.build import build_index
    from donkey_ray.pipelines.query import score_queries
    from donkey_ray.util import dataset_to_table

    texts = [
        "mon résumé est prêt",
        "a resume and a cafe",
        "straße cleanup crew",
        "strasse cleanup crew",
        "unrelated filler words",
    ]
    corpus = pa.table({
        "repo": pa.array(["r"] * len(texts)),
        "path": pa.array([f"f{i}" for i in range(len(texts))]),
        "commit": pa.array(["c"] * len(texts)),
        "lang": pa.array(["fold"] * len(texts)),
        "content": pa.array(texts),
    })
    out = str(tmp_path / "foldidx")
    build_index(ray.data.from_arrow(corpus), out, num_partitions=4,
                query_lang="fold", detect_hot=False)
    oracle = BM25Oracle.from_corpus(corpus)
    qtbl = pa.table({
        "query_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["résumé", "resume", "STRASSE"], pa.string()),
        "k": pa.array([10, 10, 10], pa.int32()),
    })
    res = dataset_to_table(score_queries(out, qtbl, mode="exact"))
    got = {}
    for r in res.to_pylist():
        got.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, text in [(0, "résumé"), (1, "resume"), (2, "STRASSE")]:
        want = oracle.topk(text, 10, lang="fold")
        have = sorted(got.get(qid, []), key=lambda p: (-p[1], p[0]))
        assert [d for d, _ in have] == [d for d, _ in want], (qid, text)
        np.testing.assert_allclose([s for _, s in have], [s for _, s in want],
                                   rtol=0, atol=1e-9)
    # accented and plain queries retrieve identical results
    assert got[0] == got[1]
    ids = {doc_id_from_key("r", f"f{i}", "c"): i for i in range(len(texts))}
    assert {ids[d] for d, _ in got[0]} == {0, 1}   # both spellings hit
    assert {ids[d] for d, _ in got[2]} == {2, 3}   # sharp-s unifies
