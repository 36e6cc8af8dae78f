"""Query scoring: dictionary + segment reader + exact/WAND top-k
(SURVEY.md B14/B19; donkey analogue [PK]: Index::search + object rerank,
src/donkey.cpp search path — SURVEY.md section 0).

``QueryEngine`` is the per-actor state (donkey's in-RAM index handle):
built once in ``__init__`` of the ``QueryScorerStage`` actor, reused for
every query batch. Postings for a term may live in several partitions
(salted hot terms); runs are decoded independently and treated as
disjoint posting iterators of the same term (their doc_id sets are
disjoint by construction), with idf computed from the summed df.
"""

from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions import scoring
from ..functions.codec import varbyte_decode
from ..functions.tokenize import get_tokenizer
from ..state import manifest as mf


class QueryEngine:
    """Loads index meta + per-partition dictionaries; serves top-k."""

    def __init__(self, index_dir: str, *, mode: str = "wand", cache_parts: int = 64) -> None:
        if not mf.is_complete(index_dir):
            raise FileNotFoundError(f"index at {index_dir} is not complete")
        self.index_dir = index_dir
        self.meta = mf.load_meta(index_dir)
        self.n_docs = int(self.meta["n_docs"])
        self.avgdl = float(self.meta["avgdl"])
        self.mode = mode
        self.query_lang = self.meta.get("query_lang", "simple")
        self._tok = get_tokenizer(self.query_lang)
        self._cache: OrderedDict[int, pa.Table] = OrderedDict()
        self._cache_parts = cache_parts
        # dictionary: term -> list[(part, row_idx, df)]
        self.dictionary: dict[str, list[tuple[int, int, int]]] = {}
        for part in self.meta["parts_built"]:
            path = mf.segment_path(index_dir, part)
            if not os.path.exists(path):
                continue
            cols = pq.read_table(path, columns=["term", "df"])
            terms = cols.column("term").to_pylist()
            dfs = cols.column("df").to_pylist()
            for i, (t, d) in enumerate(zip(terms, dfs)):
                self.dictionary.setdefault(t, []).append((part, i, int(d)))

    def _part_table(self, part: int) -> pa.Table:
        t = self._cache.get(part)
        if t is None:
            t = pq.read_table(mf.segment_path(self.index_dir, part))
            self._cache[part] = t
            while len(self._cache) > self._cache_parts:
                self._cache.popitem(last=False)
        else:
            self._cache.move_to_end(part)
        return t

    def _term_runs(self, term: str):
        """[(doc_ids int64, tfs, dls, block_last, block_max_tf, block_min_dl)]"""
        runs = []
        for part, row, _df in self.dictionary.get(term, ()):
            tbl = self._part_table(part)
            ids = np.cumsum(
                varbyte_decode(tbl.column("doc_ids")[row].as_py()), dtype=np.uint64
            ).astype(np.int64)
            tfs = varbyte_decode(tbl.column("tfs")[row].as_py()).astype(np.int64)
            dls = varbyte_decode(tbl.column("dls")[row].as_py()).astype(np.int64)
            bld = np.asarray(tbl.column("block_last_doc")[row].as_py(), dtype=np.int64)
            bmt = np.asarray(tbl.column("block_max_tf")[row].as_py(), dtype=np.int64)
            bmd = np.asarray(tbl.column("block_min_dl")[row].as_py(), dtype=np.int64)
            runs.append((ids, tfs, dls, bld, bmt, bmd))
        return runs

    def term_df(self, term: str) -> int:
        return sum(df for _, _, df in self.dictionary.get(term, ()))

    def topk(self, text: str, k: int) -> list[tuple[int, float]]:
        terms = sorted(set(self._tok.tokenize(text)))
        terms = [t for t in terms if t in self.dictionary]
        if not terms or k <= 0:
            return []
        if self.mode == "exact":
            return self._topk_exact(terms, k)
        return self._topk_wand(terms, k)

    # ---- exact DAAT over the candidate union (vectorized) ----
    def _topk_exact(self, terms: list[str], k: int) -> list[tuple[int, float]]:
        all_ids: list[np.ndarray] = []
        all_scores: list[np.ndarray] = []
        for term in terms:
            df = self.term_df(term)
            w_idf = float(scoring.idf(df, self.n_docs))
            for ids, tfs, dls, *_ in self._term_runs(term):
                all_ids.append(ids)
                all_scores.append(w_idf * scoring.tf_weight(tfs, dls, self.avgdl))
        ids = np.concatenate(all_ids)
        sc = np.concatenate(all_scores)
        uniq, inv = np.unique(ids, return_inverse=True)
        sums = np.bincount(inv, weights=sc, minlength=len(uniq))
        order = scoring.topk_order(uniq, sums, k)
        return [(int(uniq[i]), float(sums[i])) for i in order]

    # ---- block-max WAND (rank-identical: prunes by upper bound only) ----
    def _topk_wand(self, terms: list[str], k: int) -> list[tuple[int, float]]:
        # One iterator per (term, run); disjoint doc_id sets per term.
        its = []  # [ids, scores(lazy per block), pos, idf, tfs, dls, bld, bub]
        for term in terms:
            df = self.term_df(term)
            w_idf = float(scoring.idf(df, self.n_docs))
            for ids, tfs, dls, bld, bmt, bmd in self._term_runs(term):
                if len(ids) == 0:
                    continue
                # per-block upper bound (exact formula on max_tf/min_dl)
                bub = w_idf * scoring.tf_weight(bmt, bmd, self.avgdl)
                its.append(
                    {"ids": ids, "tfs": tfs, "dls": dls, "idf": w_idf,
                     "bld": bld, "bub": bub, "pos": 0,
                     "max_ub": float(bub.max())}
                )
        if not its:
            return []

        import heapq

        heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of top-k
        threshold = -np.inf

        def heap_push(doc_id: int, score: float) -> None:
            nonlocal threshold
            item = (score, -doc_id)
            if len(heap) < k:
                heapq.heappush(heap, item)
                if len(heap) == k:
                    threshold = heap[0][0]
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
                threshold = heap[0][0]

        live = [it for it in its]
        while True:
            live = [it for it in live if it["pos"] < len(it["ids"])]
            if not live:
                break
            # sort by current doc_id
            live.sort(key=lambda it: it["ids"][it["pos"]])
            # pivot: smallest prefix whose max upper bounds exceed threshold
            acc = 0.0
            pivot_idx = -1
            for i, it in enumerate(live):
                acc += it["max_ub"]
                # >= so an exact-threshold score with a smaller doc_id can
                # still displace the heap minimum (tie-break = doc_id asc)
                if acc >= threshold or (len(heap) < k):
                    pivot_idx = i
                    break
            if pivot_idx < 0:
                break  # even the sum of all bounds can't beat the threshold
            pivot_doc = int(live[pivot_idx]["ids"][live[pivot_idx]["pos"]])
            first_doc = int(live[0]["ids"][live[0]["pos"]])
            if first_doc == pivot_doc:
                # fully evaluate pivot_doc with block-max refinement
                bound = 0.0
                involved = []
                for it in live:
                    p = it["pos"]
                    if p < len(it["ids"]) and int(it["ids"][p]) == pivot_doc:
                        b = int(np.searchsorted(it["bld"], pivot_doc))
                        bound += float(it["bub"][b])
                        involved.append(it)
                if bound >= threshold or len(heap) < k:
                    score = 0.0
                    for it in involved:
                        p = it["pos"]
                        score += it["idf"] * float(
                            scoring.tf_weight(it["tfs"][p], it["dls"][p], self.avgdl)
                        )
                    heap_push(pivot_doc, score)
                for it in involved:
                    it["pos"] += 1
            else:
                # advance all iterators before the pivot to >= pivot_doc
                for it in live[:pivot_idx]:
                    p = it["pos"]
                    it["pos"] = p + int(
                        np.searchsorted(it["ids"][p:], pivot_doc, side="left")
                    )
        out = sorted(heap, key=lambda x: (-x[0], -x[1]))
        return [(-d, s) for s, d in out]
