import math

import numpy as np
import pyarrow as pa

from donkey_ray.functions import scoring
from donkey_ray.functions.hashing import doc_id_from_key
from donkey_ray.oracle import BM25Oracle
from donkey_ray.synth import COMMON_TOKEN, make_corpus, make_queries


def test_corpus_deterministic(tiny_corpus):
    again = make_corpus(100, seed=42)
    assert tiny_corpus.equals(again)
    other = make_corpus(100, seed=43)
    assert not tiny_corpus.equals(other)


def test_corpus_shape(tiny_corpus):
    assert tiny_corpus.column_names == ["repo", "path", "commit", "lang", "content"]
    keys = set(
        zip(
            tiny_corpus["repo"].to_pylist(),
            tiny_corpus["path"].to_pylist(),
            tiny_corpus["commit"].to_pylist(),
        )
    )
    assert len(keys) == tiny_corpus.num_rows


def test_common_token_everywhere(tiny_corpus):
    for c in tiny_corpus["content"].to_pylist():
        assert COMMON_TOKEN in c


def test_doc_ids_unique(small_corpus):
    ids = {
        doc_id_from_key(r, p, c)
        for r, p, c in zip(
            small_corpus["repo"].to_pylist(),
            small_corpus["path"].to_pylist(),
            small_corpus["commit"].to_pylist(),
        )
    }
    assert len(ids) == small_corpus.num_rows
    assert all(0 <= i < 2**63 for i in ids)


def test_queries_mix():
    q = make_queries(50)
    texts = q["text"].to_pylist()
    assert any("absentterm" in t for t in texts)
    dup = texts[4].split()
    assert len(dup) == 2 and dup[0] == dup[1]


def test_bm25_hand_computed():
    # 2 docs: d0 = "a b a", d1 = "b c"; N=2, avgdl=2.5
    tbl = pa.table(
        {
            "repo": ["r", "r"],
            "path": ["p0", "p1"],
            "commit": ["c0", "c1"],
            "lang": ["en", "en"],
            "content": ["a b a", "b c"],
        }
    )
    o = BM25Oracle.from_corpus(tbl)
    assert o.n_docs == 2 and o.total_len == 5 and o.avgdl == 2.5
    d0 = doc_id_from_key("r", "p0", "c0")
    hits = o.topk("a", 10)
    assert [h[0] for h in hits] == [d0]
    idf_a = math.log((2 - 1 + 0.5) / (1 + 0.5) + 1)
    tfw = 2 * 2.2 / (2 + 1.2 * (1 - 0.75 + 0.75 * 3 / 2.5))
    assert hits[0][1] == idf_a * tfw


def test_oracle_tiebreak_doc_id_asc():
    tbl = pa.table(
        {
            "repo": ["r"] * 3,
            "path": ["p0", "p1", "p2"],
            "commit": ["c"] * 3,
            "lang": ["en"] * 3,
            "content": ["x y", "x y", "x z"],
        }
    )
    o = BM25Oracle.from_corpus(tbl)
    hits = o.topk("x", 3)
    ids = [h[0] for h in hits]
    scores = [h[1] for h in hits]
    assert scores[0] == scores[1] == scores[2]  # same tf, same dl, same df
    assert ids == sorted(ids)


def test_oracle_dedups_query_terms():
    tbl = pa.table(
        {
            "repo": ["r"],
            "path": ["p"],
            "commit": ["c"],
            "lang": ["en"],
            "content": ["foo bar"],
        }
    )
    o = BM25Oracle.from_corpus(tbl)
    assert o.topk("foo foo", 5) == o.topk("foo", 5)


def test_oracle_run_queries_schema(tiny_corpus):
    o = BM25Oracle.from_corpus(tiny_corpus)
    q = make_queries(10)
    res = o.run_queries(q, lang="code")
    assert res.column_names == ["query_id", "rank", "doc_id", "score"]
    assert res.num_rows > 0
    # ranks contiguous from 1 per query
    import collections

    per_q = collections.defaultdict(list)
    for row in res.to_pylist():
        per_q[row["query_id"]].append(row["rank"])
    for ranks in per_q.values():
        assert ranks == list(range(1, len(ranks) + 1))


def test_topk_order_ties():
    ids = np.array([5, 3, 9], dtype=np.int64)
    sc = np.array([1.0, 1.0, 2.0])
    order = scoring.topk_order(ids, sc, 3)
    assert list(ids[order]) == [9, 3, 5]
