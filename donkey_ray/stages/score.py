"""Query scoring: dictionary + segment reader + exact/WAND top-k
(SURVEY.md B14/B19; donkey analogue [PK]: Index::search + object rerank,
src/donkey.cpp search path — SURVEY.md section 0).

``QueryEngine`` is the per-actor state (donkey's in-RAM index handle):
built once per ``QueryScorerStage`` actor, reused for every query batch.

A term's postings may live in several runs (salted hot terms land in
multiple partitions); each run is an independent block-max iterator of
the same term (disjoint doc_id sets), idf computed from the summed df.

Two scorers, rank/score-identical (adversarially tested):
  exact — decode every candidate posting, vectorized BM25 + top-k.
  wand  — block-max WAND with LAZY per-block decode: pruned blocks are
          never decoded (the doc-id delta stream resets per block and the
          segment stores per-block byte offsets). Single-iterator queries
          use a vectorized block-at-a-time path.
"""

from __future__ import annotations

import heapq
import os
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions import scoring
from ..functions.codec import decode_blocked_deltas, varbyte_decode
from ..functions.tokenize import get_tokenizer
from ..state import manifest as mf
from .. import schemas


class _Run:
    """Lazy block-decodable posting iterator for one (term, run)."""

    __slots__ = (
        "idf", "n", "bld", "bub", "doc_buf", "tf_buf", "dl_buf",
        "doc_boff", "tf_boff", "dl_boff", "block_size",
        "blk", "blk_docs", "blk_tf", "blk_dl", "pos", "cur_doc", "max_ub",
        "blocks_decoded",
    )

    def __init__(self, idf, row, avgdl, block_size):
        self.idf = idf
        self.doc_buf = row["doc_ids"]
        self.tf_buf = row["tfs"]
        self.dl_buf = row["dls"]
        self.bld = np.asarray(row["block_last_doc"], dtype=np.int64)
        bmt = np.asarray(row["block_max_tf"], dtype=np.float64)
        bmd = np.asarray(row["block_min_dl"], dtype=np.float64)
        self.bub = idf * scoring.tf_weight(bmt, bmd, avgdl)
        self.doc_boff = np.asarray(row["block_doc_boff"], dtype=np.int64)
        self.tf_boff = np.asarray(row["block_tf_boff"], dtype=np.int64)
        self.dl_boff = np.asarray(row["block_dl_boff"], dtype=np.int64)
        self.n = int(row["df"])
        self.block_size = block_size
        self.max_ub = float(self.bub.max()) if len(self.bub) else 0.0
        self.blk = -1
        self.blk_tf = None
        self.blk_dl = None
        self.pos = 0
        self.blocks_decoded = 0
        self._load_block(0)

    def _load_block(self, b: int) -> None:
        buf = self.doc_buf[self.doc_boff[b]: self.doc_boff[b + 1]]
        d = varbyte_decode(buf)
        self.blk_docs = np.cumsum(d, dtype=np.uint64).astype(np.int64)
        self.blk = b
        self.blk_tf = None
        self.blk_dl = None
        self.pos = 0
        self.cur_doc = int(self.blk_docs[0])
        self.blocks_decoded += 1

    @property
    def exhausted(self) -> bool:
        return self.blk < 0

    def _exhaust(self) -> None:
        self.blk = -1
        self.cur_doc = 1 << 62

    def next_geq(self, d: int) -> None:
        """Advance to the first doc >= d."""
        if self.blk < 0 or self.cur_doc >= d:
            return
        b = int(np.searchsorted(self.bld, d, side="left"))
        if b >= len(self.bld):
            self._exhaust()
            return
        if b != self.blk:
            self._load_block(b)
        p = int(np.searchsorted(self.blk_docs, d, side="left"))
        self.pos = p
        self.cur_doc = int(self.blk_docs[p])

    def advance(self) -> None:
        p = self.pos + 1
        if p < len(self.blk_docs):
            self.pos = p
            self.cur_doc = int(self.blk_docs[p])
        elif self.blk + 1 < len(self.bld):
            self._load_block(self.blk + 1)
        else:
            self._exhaust()

    def block_ub(self) -> float:
        return float(self.bub[self.blk])

    def block_end_doc(self) -> int:
        return int(self.bld[self.blk])

    def score_current(self, avgdl: float) -> float:
        if self.blk_tf is None:
            b = self.blk
            self.blk_tf = varbyte_decode(
                self.tf_buf[self.tf_boff[b]: self.tf_boff[b + 1]]
            ).astype(np.float64)
            self.blk_dl = varbyte_decode(
                self.dl_buf[self.dl_boff[b]: self.dl_boff[b + 1]]
            ).astype(np.float64)
        return self.idf * float(
            scoring.tf_weight(self.blk_tf[self.pos], self.blk_dl[self.pos], avgdl)
        )

    def decode_block_scores(self, avgdl: float):
        """Vectorized (docs, scores) of the CURRENT block."""
        b = self.blk
        tf = varbyte_decode(self.tf_buf[self.tf_boff[b]: self.tf_boff[b + 1]])
        dl = varbyte_decode(self.dl_buf[self.dl_boff[b]: self.dl_boff[b + 1]])
        return self.blk_docs, self.idf * scoring.tf_weight(tf, dl, avgdl)


class QueryEngine:
    """Loads index meta + per-partition dictionaries; serves top-k."""

    def __init__(self, index_dir: str | list[str], *, mode: str = "auto",
                 cache_parts: int = 64) -> None:
        """``index_dir`` may be a LIST of index dirs: federated exact BM25
        over the union corpus (incremental builds are queried without
        compaction — donkey's multi-segment search analogue). Stats are
        summed; runs across indexes are extra disjoint iterators."""
        dirs = [index_dir] if isinstance(index_dir, str) else list(index_dir)
        for d in dirs:
            if not mf.is_complete(d):
                raise FileNotFoundError(f"index at {d} is not complete")
        self.index_dirs = dirs
        self.index_dir = dirs[0]
        metas = [mf.load_meta(d) for d in dirs]
        self.meta = metas[0]
        self.n_docs = int(sum(m["n_docs"] for m in metas))
        total_len = sum(m["total_len"] for m in metas)
        self.avgdl = (total_len / self.n_docs) if self.n_docs else 0.0
        self.block_size = int(self.meta.get("block_size", schemas.BLOCK_SIZE))
        self.mode = mode
        self.query_lang = self.meta.get("query_lang", "simple")
        self._tok = get_tokenizer(self.query_lang)
        self._cache: OrderedDict[tuple[int, int], pa.Table] = OrderedDict()
        self._cache_parts = cache_parts
        self.blocks_decoded = 0  # instrumentation (pruning effectiveness)
        # dictionary: term -> list[(index_idx, part, row_idx, df)]
        self.dictionary: dict[str, list[tuple[int, int, int, int]]] = {}
        for ix, (d, m) in enumerate(zip(dirs, metas)):
            for part in m["parts_built"]:
                path = mf.segment_path(d, part)
                if not os.path.exists(path):
                    continue
                cols = pq.read_table(path, columns=["term", "df"])
                terms = cols.column("term").to_pylist()
                dfs = cols.column("df").to_pylist()
                for i, (t, df) in enumerate(zip(terms, dfs)):
                    self.dictionary.setdefault(t, []).append((ix, part, i, int(df)))

    def _part_table(self, ix: int, part: int) -> pa.Table:
        key = (ix, part)
        t = self._cache.get(key)
        if t is None:
            t = pq.read_table(mf.segment_path(self.index_dirs[ix], part))
            self._cache[key] = t
            while len(self._cache) > self._cache_parts:
                self._cache.popitem(last=False)
        else:
            self._cache.move_to_end(key)
        return t

    def _run_rows(self, term: str) -> list[dict]:
        rows = []
        for ix, part, row, _df in self.dictionary.get(term, ()):
            tbl = self._part_table(ix, part)
            rows.append({name: tbl.column(name)[row].as_py()
                         for name in tbl.column_names})
        return rows

    def term_df(self, term: str) -> int:
        return sum(df for _, _, _, df in self.dictionary.get(term, ()))

    # auto mode: below this many candidate postings the vectorized
    # decode-everything scorer beats WAND's block bookkeeping; above it,
    # lazy block-max pruning wins (and at 10^12-doc scale is mandatory)
    AUTO_EXACT_MAX_POSTINGS = 1_000_000

    def topk(self, text: str, k: int) -> list[tuple[int, float]]:
        terms = sorted(set(self._tok.tokenize(text)))
        terms = [t for t in terms if t in self.dictionary]
        if not terms or k <= 0:
            return []
        mode = self.mode
        if mode == "auto":
            total = sum(self.term_df(t) for t in terms)
            mode = "exact" if total <= self.AUTO_EXACT_MAX_POSTINGS else "wand"
        if mode == "exact":
            return self._topk_exact(terms, k)
        return self._topk_wand(terms, k)

    # ---- exact: decode-everything vectorized scoring ----
    def _topk_exact(self, terms: list[str], k: int) -> list[tuple[int, float]]:
        all_ids: list[np.ndarray] = []
        all_scores: list[np.ndarray] = []
        for term in terms:
            df = self.term_df(term)
            w_idf = float(scoring.idf(df, self.n_docs))
            for row in self._run_rows(term):
                n = int(row["df"])
                ids = decode_blocked_deltas(row["doc_ids"], n, self.block_size)
                tfs = varbyte_decode(row["tfs"]).astype(np.float64)
                dls = varbyte_decode(row["dls"]).astype(np.float64)
                all_ids.append(ids)
                all_scores.append(w_idf * scoring.tf_weight(tfs, dls, self.avgdl))
        ids = np.concatenate(all_ids)
        sc = np.concatenate(all_scores)
        uniq, inv = np.unique(ids, return_inverse=True)
        sums = np.bincount(inv, weights=sc, minlength=len(uniq))
        order = scoring.topk_order(uniq, sums, k)
        return [(int(uniq[i]), float(sums[i])) for i in order]

    # ---- block-max WAND with lazy block decode ----
    def _topk_wand(self, terms: list[str], k: int) -> list[tuple[int, float]]:
        runs: list[_Run] = []
        for term in terms:
            df = self.term_df(term)
            w_idf = float(scoring.idf(df, self.n_docs))
            for row in self._run_rows(term):
                if int(row["df"]) > 0:
                    runs.append(_Run(w_idf, row, self.avgdl, self.block_size))
        if not runs:
            return []
        try:
            if len(terms) == 1:
                # all runs belong to one term -> doc sets are disjoint
                # (salted runs cover disjoint doc_id ranges): fully
                # vectorized block-at-a-time across the union of blocks
                return self._disjoint_runs_topk(runs, k)
            return self._bmw(runs, k)
        finally:
            self.blocks_decoded += sum(r.blocks_decoded for r in runs)

    def _disjoint_runs_topk(self, runs: list[_Run], k: int) -> list[tuple[int, float]]:
        """Single-term queries (possibly many salted runs with disjoint doc
        sets): visit the union of blocks in descending upper bound,
        decode+score a block only while its bound can beat the current
        threshold; merge fully vectorized."""
        ubs = np.concatenate([r.bub for r in runs])
        run_idx = np.concatenate(
            [np.full(len(r.bub), i, dtype=np.int64) for i, r in enumerate(runs)]
        )
        blk_idx = np.concatenate(
            [np.arange(len(r.bub), dtype=np.int64) for r in runs]
        )
        order = np.argsort(-ubs, kind="stable")
        best_docs = np.empty(0, dtype=np.int64)
        best_scores = np.empty(0, dtype=np.float64)
        threshold = -np.inf
        for j in order:
            if len(best_docs) >= k and ubs[j] < threshold:
                break
            run = runs[run_idx[j]]
            b = int(blk_idx[j])
            if b != run.blk:
                run._load_block(b)
            docs, scores = run.decode_block_scores(self.avgdl)
            best_docs = np.concatenate((best_docs, docs))
            best_scores = np.concatenate((best_scores, scores))
            sel = scoring.topk_order(best_docs, best_scores, k)
            best_docs, best_scores = best_docs[sel], best_scores[sel]
            if len(best_docs) >= k:
                threshold = float(best_scores[-1])
        return list(zip(best_docs.tolist(), best_scores.tolist()))

    def _bmw(self, runs: list[_Run], k: int) -> list[tuple[int, float]]:
        heap: list[tuple[float, int]] = []
        threshold = -np.inf

        def push(doc_id: int, score: float) -> None:
            nonlocal threshold
            item = (score, -doc_id)
            if len(heap) < k:
                heapq.heappush(heap, item)
                if len(heap) == k:
                    threshold = heap[0][0]
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
                threshold = heap[0][0]

        live = list(runs)
        while True:
            live = [r for r in live if not r.exhausted]
            if not live:
                break
            live.sort(key=lambda r: r.cur_doc)
            # pivot: smallest prefix whose summed MAX upper bounds can reach
            # the threshold (>= so exact-threshold ties with smaller doc_id
            # are still evaluated — pinned tie-break is doc_id asc)
            acc = 0.0
            pivot_idx = -1
            for i, r in enumerate(live):
                acc += r.max_ub
                if len(heap) < k or acc >= threshold:
                    pivot_idx = i
                    break
            if pivot_idx < 0:
                break
            pivot_doc = live[pivot_idx].cur_doc
            if live[0].cur_doc == pivot_doc:
                involved = [r for r in live if r.cur_doc == pivot_doc]
                block_bound = sum(r.block_ub() for r in involved)
                if len(heap) < k or block_bound >= threshold:
                    score = 0.0
                    for r in involved:
                        score += r.score_current(self.avgdl)
                    push(pivot_doc, score)
                    for r in involved:
                        r.advance()
                else:
                    # block-level skip: nothing in [pivot_doc, d_next) can
                    # win — involved blocks are bounded out and other runs
                    # only start at their cur_doc
                    d_next = min(r.block_end_doc() for r in involved) + 1
                    for r in live[pivot_idx + 1:]:
                        d_next = min(d_next, r.cur_doc)
                    if d_next <= pivot_doc:
                        d_next = pivot_doc + 1
                    for r in involved:
                        r.next_geq(d_next)
            else:
                for r in live[:pivot_idx]:
                    r.next_geq(pivot_doc)
        out = sorted(heap, key=lambda x: (-x[0], -x[1]))
        return [(-d, s) for s, d in out]
