"""Golden-file regression tests (FIXTURES.md sections 2/3/5): pin the
codec wire format, the synthetic corpus bytes, and the oracle's top-k so
any accidental spec drift (tokenizer, BM25 constants, codec layout,
generator) fails loudly."""

import hashlib
import json
import os

import numpy as np
import pyarrow.parquet as pq

from donkey_ray.functions.codec import decode_postings, encode_postings
from donkey_ray.oracle import BM25Oracle
from donkey_ray.synth import make_corpus, make_queries

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_varbyte_golden_cases():
    with open(os.path.join(GOLDEN, "varbyte_cases.json")) as f:
        cases = json.load(f)
    assert len(cases) >= 8
    for case in cases:
        ids = np.array(case["doc_ids"], dtype=np.int64)
        assert encode_postings(ids).hex() == case["hex"], case
        assert decode_postings(bytes.fromhex(case["hex"])).tolist() == case["doc_ids"]


def test_corpus_sha256_rollup_stable():
    corpus = make_corpus(1000, seed=42)
    got = sorted(
        hashlib.sha256(c.encode()).hexdigest()
        for c in corpus["content"].to_pylist()
    )
    with open(os.path.join(GOLDEN, "corpus_small_sha256.json")) as f:
        want = json.load(f)
    assert got == want


def test_oracle_topk_golden():
    corpus = make_corpus(1000, seed=42)
    oracle = BM25Oracle.from_corpus(corpus)
    got = oracle.run_queries(make_queries(200), lang="code")
    want = pq.read_table(os.path.join(GOLDEN, "topk_small.parquet"))
    assert got.column("doc_id").to_pylist() == want.column("doc_id").to_pylist()
    np.testing.assert_allclose(
        got.column("score").to_pylist(), want.column("score").to_pylist(),
        rtol=0, atol=1e-12,
    )
