"""Brute-force pinned-spec BM25 oracle (SURVEY.md section 5.1).

Pure-Python dict-based reference engine: same tokenizer module, exact BM25
(functions/scoring.py constants), exhaustive scoring, (score desc, doc_id
asc) tie-break. Every engine result must be rank- AND score-identical
(float64). Stands in for 'the reference engine's top-k docIDs and scores'
given that /root/reference was empty at survey time (SURVEY.md section 0).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

from .functions import scoring
from .functions.hashing import doc_id_from_key
from .functions.tokenize import get_tokenizer


class BM25Oracle:
    def __init__(self) -> None:
        self.postings: dict[str, dict[int, int]] = {}
        self.dl: dict[int, int] = {}
        self.n_docs = 0
        self.total_len = 0

    @classmethod
    def from_corpus(cls, corpus: pa.Table, id_col: str | None = None) -> "BM25Oracle":
        self = cls()
        cols = corpus.to_pylist()
        for row in cols:
            tok = get_tokenizer(row.get("lang") or "simple")
            tokens = tok.tokenize(row["content"])
            if id_col:
                doc_id = int(row[id_col])
            else:
                doc_id = doc_id_from_key(row["repo"], row["path"], row["commit"])
            assert doc_id not in self.dl, f"duplicate doc_id {doc_id}"
            self.dl[doc_id] = len(tokens)
            self.n_docs += 1
            self.total_len += len(tokens)
            for term, tf in Counter(tokens).items():
                self.postings.setdefault(term, {})[doc_id] = tf
        return self

    @property
    def avgdl(self) -> float:
        return self.total_len / self.n_docs if self.n_docs else 0.0

    def topk(self, text: str, k: int, lang: str = "simple") -> list[tuple[int, float]]:
        """[(doc_id, score)] for the top-k; query terms deduplicated."""
        terms = sorted(set(get_tokenizer(lang).tokenize(text)))
        scores: dict[int, float] = {}
        for term in terms:
            plist = self.postings.get(term)
            if not plist:
                continue
            w_idf = float(scoring.idf(len(plist), self.n_docs))
            for doc_id, tf in plist.items():
                w = w_idf * float(scoring.tf_weight(tf, self.dl[doc_id], self.avgdl))
                scores[doc_id] = scores.get(doc_id, 0.0) + w
        if not scores:
            return []
        ids = np.fromiter(scores.keys(), dtype=np.int64, count=len(scores))
        vals = np.fromiter(scores.values(), dtype=np.float64, count=len(scores))
        order = scoring.topk_order(ids, vals, k)
        return [(int(ids[i]), float(vals[i])) for i in order]

    def and_topk(self, text: str, k: int, lang: str = "simple") -> list[tuple[int, float]]:
        """Conjunctive reference: docs containing EVERY distinct query
        term, scored with the same summed BM25 over the distinct terms."""
        terms = sorted(set(get_tokenizer(lang).tokenize(text)))
        if not terms:
            return []
        plists = [self.postings.get(t) for t in terms]
        if any(p is None for p in plists):
            return []
        cand = set(plists[0])
        for p in plists[1:]:
            cand &= p.keys()
        if not cand:
            return []
        scores: dict[int, float] = {d: 0.0 for d in cand}
        for plist in plists:
            w_idf = float(scoring.idf(len(plist), self.n_docs))
            for d in cand:
                scores[d] += w_idf * float(
                    scoring.tf_weight(plist[d], self.dl[d], self.avgdl)
                )
        ids = np.fromiter(scores.keys(), dtype=np.int64, count=len(scores))
        vals = np.fromiter(scores.values(), dtype=np.float64, count=len(scores))
        order = scoring.topk_order(ids, vals, k)
        return [(int(ids[i]), float(vals[i])) for i in order]

    def run_queries(self, queries: pa.Table, lang: str = "simple") -> pa.Table:
        """RESULTS-schema table for a QUERIES-schema table."""
        qid, rank, did, sc = [], [], [], []
        for row in queries.to_pylist():
            hits = self.topk(row["text"], int(row["k"]), lang=lang)
            for r, (d, s) in enumerate(hits, start=1):
                qid.append(int(row["query_id"]))
                rank.append(r)
                did.append(d)
                sc.append(s)
        return pa.table(
            {
                "query_id": pa.array(qid, pa.int64()),
                "rank": pa.array(rank, pa.int32()),
                "doc_id": pa.array(did, pa.int64()),
                "score": pa.array(sc, pa.float64()),
            }
        )
