"""Query scoring: dictionary + segment reader + exact/WAND top-k
(SURVEY.md B14/B19; donkey analogue [PK]: Index::search + object rerank,
src/donkey.cpp search path — SURVEY.md section 0).

``QueryEngine`` is the per-actor state (donkey's in-RAM index handle):
built once per ``QueryScorerStage`` actor, reused for every query batch.
Its dictionary is sharded and lazy (``_SegmentShard``): terms are routed
to candidate partitions by the build-time hash (+ salt table for hot
terms) and resolved by row-group-pruned binary search, so per-actor
memory never scales with corpus vocabulary.

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
        "scorer", "idf", "n", "bld", "bub", "doc_buf", "tf_buf", "dl_buf",
        "doc_boff", "tf_boff", "dl_boff", "block_size",
        "blk", "blk_docs", "blk_tf", "blk_dl", "pos", "cur_doc", "max_ub",
        "blocks_decoded",
    )

    def __init__(self, idf, row, avgdl, block_size, scorer=None):
        self.scorer = scorer or scoring.BM25Scorer()
        self.idf = idf
        self.doc_buf = row["doc_ids"]
        self.tf_buf = row["tfs"]
        self.dl_buf = row["dls"]
        self.bld = np.asarray(row["block_last_doc"], dtype=np.int64)
        bmt = np.asarray(row["block_max_tf"], dtype=np.float64)
        bmd = np.asarray(row["block_min_dl"], dtype=np.float64)
        self.bub = idf * self.scorer.tf_weight(bmt, bmd, avgdl)
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
            self.scorer.tf_weight(self.blk_tf[self.pos], self.blk_dl[self.pos], avgdl)
        )

    def decode_block_scores(self, avgdl: float):
        """Vectorized (docs, scores) of the CURRENT block."""
        b = self.blk
        tf = varbyte_decode(self.tf_buf[self.tf_boff[b]: self.tf_boff[b + 1]])
        dl = varbyte_decode(self.dl_buf[self.dl_boff[b]: self.dl_boff[b + 1]])
        return self.blk_docs, self.idf * self.scorer.tf_weight(tf, dl, avgdl)


class _SegmentShard:
    """Lazy sharded-dictionary access for ONE segment file (SURVEY.md A5
    serving path at scale).

    Segment rows are term-sorted on disk, so a term lookup is: (1) prune
    to one parquet row group via the term column's min/max statistics,
    (2) binary-search the (cached) term column of that row group, (3)
    fetch the full row group only on a hit. Per-shard memory is bounded
    by the row-group LRU caches — NEVER proportional to the partition's
    vocabulary, so actors stay small at 10^9+-term corpora."""

    def __init__(self, path: str, *, cache_groups: int = 16) -> None:
        self.pf = pq.ParquetFile(path)
        md = self.pf.metadata
        self.n_groups = md.num_row_groups if md.num_rows else 0
        self._term_ci = None
        self.rg_min: list[str | None] = []
        self.rg_max: list[str | None] = []
        if self.n_groups:
            rg0 = md.row_group(0)
            for i in range(rg0.num_columns):
                if rg0.column(i).path_in_schema == "term":
                    self._term_ci = i
                    break
            for g in range(self.n_groups):
                st = md.row_group(g).column(self._term_ci).statistics
                if st is not None and st.has_min_max:
                    self.rg_min.append(st.min)
                    self.rg_max.append(st.max)
                else:
                    self.rg_min.append(None)
                    self.rg_max.append(None)
        self._terms_cache: OrderedDict[int, np.ndarray] = OrderedDict()
        self._group_cache: OrderedDict[int, pa.Table] = OrderedDict()
        self._cache_groups = cache_groups

    def _lru(self, cache: OrderedDict, g: int, load):
        v = cache.get(g)
        if v is None:
            v = cache[g] = load()
            while len(cache) > self._cache_groups:
                cache.popitem(last=False)
        else:
            cache.move_to_end(g)
        return v

    def _candidate_group(self, term: str) -> int | None:
        lo, hi = 0, self.n_groups - 1
        if hi < 0:
            return None
        if any(m is None for m in self.rg_max):
            # stats missing (shouldn't happen with our writer): scan
            for g in range(self.n_groups):
                terms = self._group_terms(g)
                if len(terms) and terms[0] <= term <= terms[-1]:
                    return g
            return None
        import bisect

        g = bisect.bisect_left(self.rg_max, term)
        if g >= self.n_groups or self.rg_min[g] > term:
            return None
        return g

    def _group_terms(self, g: int) -> np.ndarray:
        return self._lru(
            self._terms_cache, g,
            lambda: self.pf.read_row_group(g, columns=["term"])
            .column("term").to_numpy(zero_copy_only=False),
        )

    def terms_in_range(self, lo: str, hi: str) -> list[str]:
        """All dictionary terms t with lo <= t < hi, in term order.
        Row groups whose [min, max] term statistics don't overlap the
        range are never read; overlapping groups cost one (LRU-cached)
        term-column read + binary search."""
        out: list[str] = []
        for g in range(self.n_groups):
            mn, mx = self.rg_min[g], self.rg_max[g]
            if mn is not None and (mx < lo or mn >= hi):
                continue
            terms = self._group_terms(g)
            i = int(np.searchsorted(terms, lo, side="left"))
            j = int(np.searchsorted(terms, hi, side="left"))
            out.extend(terms[i:j].tolist())
        return out

    def find_df(self, term: str) -> int | None:
        """df of ``term`` (or None) WITHOUT touching posting buffers:
        reads only the candidate row group's df column (LRU-cached).
        Used by df pre-passes (scatter-gather idf resolution) where the
        full row-group read of find() would be wasted I/O."""
        g = self._candidate_group(term)
        if g is None:
            return None
        terms = self._group_terms(g)
        i = int(np.searchsorted(terms, term))
        if i >= len(terms) or terms[i] != term:
            return None
        dfs = self._lru(
            self._terms_cache, -g - 1,
            lambda: self.pf.read_row_group(g, columns=["df"])
            .column("df").to_numpy(zero_copy_only=False),
        )
        return int(dfs[i])

    def find(self, term: str) -> dict | None:
        """Full segment row for ``term`` (postings + block metadata), or
        None. Costs at most one row-group term-column read + (on hit)
        one full row-group read, both LRU-cached."""
        g = self._candidate_group(term)
        if g is None:
            return None
        terms = self._group_terms(g)
        i = int(np.searchsorted(terms, term))
        if i >= len(terms) or terms[i] != term:
            return None
        tbl = self._lru(self._group_cache, g, lambda: self.pf.read_row_group(g))
        return {name: tbl.column(name)[i].as_py() for name in tbl.column_names}


class _PhrasePostings:
    """Positional postings of ONE term across its runs (salted / federated
    — disjoint doc sets), merged doc-sorted, with LAZY per-block position
    decode: only blocks that contain candidate postings are ever decoded
    (the position delta stream resets at every posting and the segment
    stores per-block byte offsets)."""

    def __init__(self, rows: list[dict], block_size: int) -> None:
        self.block_size = block_size
        self.rows = rows
        self._run_docs = [
            decode_blocked_deltas(r["doc_ids"], int(r["df"]), block_size)
            for r in rows
        ]
        self._run_tfs = [
            varbyte_decode(r["tfs"]).astype(np.int64) for r in rows
        ]
        docs = np.concatenate(self._run_docs)
        dls = np.concatenate(
            [varbyte_decode(r["dls"]).astype(np.int64) for r in rows]
        )
        run_id = np.concatenate(
            [np.full(len(d), i, dtype=np.int64)
             for i, d in enumerate(self._run_docs)]
        )
        loc = np.concatenate(
            [np.arange(len(d), dtype=np.int64) for d in self._run_docs]
        )
        order = np.argsort(docs, kind="stable")
        self.docs = docs[order]  # globally sorted; unique (runs disjoint)
        self.dls = dls[order]
        self.tfs = np.concatenate(self._run_tfs)[order]
        self._run_id = run_id[order]
        self._loc = loc[order]

    def positions_for(self, sel: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """sel: indices into self.docs. Returns (docs_rep, positions) —
        every (doc, token position) pair of the selected postings,
        flattened. Decodes only the blocks the selected postings live in."""
        out_docs: list[np.ndarray] = []
        out_pos: list[np.ndarray] = []
        run_sel = self._run_id[sel]
        for r in np.unique(run_sel):
            m = run_sel == r
            idxs = np.sort(self._loc[sel[m]])
            d, p = self._run_positions(int(r), idxs)
            out_docs.append(d)
            out_pos.append(p)
        if not out_docs:
            return (np.empty(0, dtype=np.int64),) * 2
        return np.concatenate(out_docs), np.concatenate(out_pos)

    def _run_positions(self, r: int, idxs: np.ndarray):
        row = self.rows[r]
        boff = np.asarray(row["block_pos_boff"], dtype=np.int64)
        tfs = self._run_tfs[r]
        docs = self._run_docs[r]
        bs = self.block_size
        n = len(docs)
        out_docs: list[np.ndarray] = []
        out_pos: list[np.ndarray] = []
        for b in np.unique(idxs // bs):
            lo, hi = int(b) * bs, min((int(b) + 1) * bs, n)
            deltas = varbyte_decode(row["poss"][boff[b]: boff[b + 1]])
            counts = tfs[lo:hi]
            starts = np.zeros(len(counts), dtype=np.int64)
            np.cumsum(counts[:-1], out=starts[1:])
            c = np.cumsum(deltas, dtype=np.uint64)
            prefix = c[starts] - deltas[starts]
            abs_pos = (c - np.repeat(prefix, counts)).astype(np.int64)
            j = idxs[(idxs >= lo) & (idxs < hi)] - lo
            s, cnt = starts[j], counts[j]
            total = int(cnt.sum())
            # ragged gather: flat indices of the selected postings' slices
            flat = np.repeat(s, cnt) + (
                np.arange(total, dtype=np.int64)
                - np.repeat(np.cumsum(cnt) - cnt, cnt)
            )
            out_pos.append(abs_pos[flat])
            out_docs.append(np.repeat(docs[j + lo], cnt))
        return np.concatenate(out_docs), np.concatenate(out_pos)


class QueryEngine:
    """Index handle with a SHARDED, lazily-loaded dictionary; serves top-k.

    No global term dictionary is ever built: a term's candidate
    partitions are recomputed from the routing hash (cold terms: one
    partition; hot terms: the salted partition set from the build
    manifest), and each partition shard resolves the term by row-group-
    pruned binary search (_SegmentShard). Per-actor memory is O(LRU
    caches), independent of corpus vocabulary."""

    def __init__(self, index_dir: str | list[str], *, mode: str = "auto",
                 cache_parts: int = 64, scorer: str = "bm25") -> None:
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
        self.metas = metas
        self.meta = metas[0]
        # federated correctness requires ONE segment format + ONE query
        # tokenizer across all member indexes; differing members would
        # silently mis-decode doc ids / tokenize inconsistently.
        # format_version compares by SEGMENT-FORMAT GENERATION: v3 only
        # added the optional docs doc_len column + lang_stats meta (the
        # posting encoding is byte-identical to v2), so a v2 base with a
        # v3 delta federates fine — a hard equality here would wedge
        # IndexServer.flush on every pre-bump artifact.
        compat = {2: 2, 3: 2}
        for key in ("block_size", "format_version", "query_lang"):
            vals = {m.get(key) for m in metas}
            if key == "format_version":
                vals = {compat.get(v, v) for v in vals}
            if len(vals) > 1:
                raise ValueError(
                    f"federated indexes disagree on {key}: {sorted(map(str, vals))}"
                )
        self.n_docs = int(sum(m["n_docs"] for m in metas))
        total_len = sum(m["total_len"] for m in metas)
        self.avgdl = (total_len / self.n_docs) if self.n_docs else 0.0
        # per-lang collection stats (SURVEY §1.2 "+ per-lang"), summed
        # across federated members; {} for pre-v3 artifacts
        self.lang_stats: dict = {}
        for m in metas:
            for lg, st in (m.get("lang_stats") or {}).items():
                cur = self.lang_stats.setdefault(
                    lg, {"n_docs": 0, "total_len": 0})
                cur["n_docs"] += int(st["n_docs"])
                cur["total_len"] += int(st["total_len"])
        for st in self.lang_stats.values():
            st["avgdl"] = (st["total_len"] / st["n_docs"]
                           if st["n_docs"] else 0.0)
        self.block_size = int(self.meta.get("block_size", schemas.BLOCK_SIZE))
        self.mode = mode
        self.query_lang = self.meta.get("query_lang", "simple")
        self._tok = get_tokenizer(self.query_lang)
        # pluggable scorer (functions.scoring.register_scorer); WAND
        # requires the monotonicity contract documented there
        self.scorer = scoring.get_scorer(scorer)
        self._hot = [set(m.get("hot_terms", ())) for m in metas]
        self._parts_built = [set(m["parts_built"]) for m in metas]
        self._shards: dict[tuple[int, int], _SegmentShard | None] = {}
        self._cache_parts = cache_parts
        # small term->runs LRU (bounded; helps repeated query terms)
        self._runs_cache: OrderedDict[str, list[dict]] = OrderedDict()
        # decoded-run LRU for the exact path: hot (Zipf) query terms
        # re-decode the same posting buffers on every query otherwise.
        # Budget counts decoded VALUES (ids+tfs+dls), so per-actor
        # memory stays bounded (~8M values ~= 64 MB) however hot the
        # workload — keys are the raw buffer bytes (content-compared)
        self._decoded_cache: "OrderedDict[tuple, tuple]" = OrderedDict()
        self._decoded_values = 0
        self._decoded_budget = 8_000_000
        # term-level LRU: the fully MERGED, idf-scaled (ids, scores) of
        # one term is query-independent end-to-end (df, avgdl, n_docs
        # are engine constants), so a repeated query term costs one
        # cache hit + top-k instead of re-merging its salted runs
        self._term_cache: "OrderedDict[tuple, tuple]" = OrderedDict()
        self._term_values = 0
        self._term_budget = 8_000_000
        # top-docs LRU (the Lucene top-impacts shortcut): a SINGLE-term
        # query's ranked top-K is query-independent, so it caches whole
        # — answering a repeated one-term query costs O(k), no pass
        # over the posting-length arrays at all. Byte-budgeted INCLUDING
        # the raw posting buffers the keys pin (they dominate for
        # mid-df terms); exactness is preserved because the entry is
        # the same topk_order the full path would compute.
        self._topdocs_cache: "OrderedDict[tuple, tuple]" = OrderedDict()
        self._topdocs_bytes = 0
        self.blocks_decoded = 0  # instrumentation (pruning effectiveness)

    def _shard(self, ix: int, part: int) -> _SegmentShard | None:
        key = (ix, part)
        if key not in self._shards:
            path = mf.segment_path(self.index_dirs[ix], part)
            self._shards[key] = (
                _SegmentShard(path) if os.path.exists(path) else None
            )
            # bound the number of open shards (file handles + caches)
            while len(self._shards) > max(self._cache_parts, 4):
                self._shards.pop(next(iter(self._shards)))
        return self._shards[key]

    def _candidate_parts(self, ix: int, term: str) -> list[int]:
        from ..functions.hashing import salted_parts, stable_term_hash

        m = self.metas[ix]
        P = int(m["num_partitions"])
        if term in self._hot[ix]:
            return salted_parts(term, P, int(m.get("salt_bits", 4)))
        return [stable_term_hash(term) % P]

    def term_runs(self, term: str) -> list[dict]:
        """All posting runs of ``term`` across indexes/salted partitions
        (disjoint doc sets), resolved via the sharded dictionary."""
        runs = self._runs_cache.get(term)
        if runs is not None:
            self._runs_cache.move_to_end(term)
            return runs
        runs = []
        for ix in range(len(self.index_dirs)):
            for part in self._candidate_parts(ix, term):
                if part not in self._parts_built[ix]:
                    continue
                shard = self._shard(ix, part)
                if shard is None:
                    continue
                row = shard.find(term)
                if row is not None:
                    runs.append(row)
        self._runs_cache[term] = runs
        while len(self._runs_cache) > 1024:
            self._runs_cache.popitem(last=False)
        return runs

    def term_df(self, term: str) -> int:
        return sum(int(r["df"]) for r in self.term_runs(term))

    # auto mode: below this many candidate postings the vectorized
    # decode-everything scorer beats WAND's block bookkeeping; above it,
    # lazy block-max pruning wins (and at 10^12-doc scale is mandatory)
    AUTO_EXACT_MAX_POSTINGS = 1_000_000

    def topk(self, text: str, k: int) -> list[tuple[int, float]]:
        terms = sorted(set(self._tok.tokenize(text)))
        runs_by_term = {t: r for t in terms if (r := self.term_runs(t))}
        return self._dispatch_topk(runs_by_term, k)

    def _dispatch_topk(
        self, runs_by_term: dict[str, list[dict]], k: int
    ) -> list[tuple[int, float]]:
        if not runs_by_term or k <= 0:
            return []
        mode = self.mode
        if mode == "auto":
            total = sum(
                int(row["df"]) for rs in runs_by_term.values() for row in rs
            )
            mode = "exact" if total <= self.AUTO_EXACT_MAX_POSTINGS else "wand"
        if mode == "exact":
            return self._topk_exact(runs_by_term, k)
        return self._topk_wand(runs_by_term, k)

    def expand_prefix(self, prefix: str, *, max_terms: int = 256) -> list[str]:
        """All dictionary terms starting with ``prefix``, unioned across
        every built partition of every federated index. A hash-sharded
        dictionary cannot route a prefix, so the scan fans out to ALL
        partitions — but each partition only reads the row groups whose
        term-statistics range overlaps [prefix, prefix+1), so the cost is
        O(partitions) row-group reads, not O(vocabulary). Raises if the
        expansion exceeds ``max_terms`` (guard against one-letter
        prefixes over a 10^9-term vocabulary)."""
        if not prefix:
            raise ValueError("empty prefix")
        lo, hi = prefix, prefix[:-1] + chr(ord(prefix[-1]) + 1)
        found: set[str] = set()
        for ix in range(len(self.index_dirs)):
            for part in sorted(self._parts_built[ix]):
                shard = self._shard(ix, part)
                if shard is None:
                    continue
                found.update(shard.terms_in_range(lo, hi))
                if len(found) > max_terms:
                    raise ValueError(
                        f"prefix {prefix!r} expands to more than "
                        f"{max_terms} terms"
                    )
        return sorted(found)

    def prefix_topk(
        self, prefix: str, k: int, *, max_terms: int = 256
    ) -> list[tuple[int, float]]:
        """Wildcard (prefix*) top-k: expand the prefix to its matching
        dictionary terms, then ordinary disjunctive BM25 over the
        expansion — each expanded term contributes with its own global
        df, exactly as if the user had typed all matching terms."""
        toks = self._tok.tokenize(prefix)
        if not toks or k <= 0:
            return []
        terms = self.expand_prefix(toks[0], max_terms=max_terms)
        runs_by_term = {t: r for t in terms if (r := self.term_runs(t))}
        return self._dispatch_topk(runs_by_term, k)

    def phrase_topk(self, text: str, k: int) -> list[tuple[int, float]]:
        """Exact phrase top-k over a POSITIONAL index (built with
        positions=True). The phrase is scored as a pseudo-term: tf = number
        of occurrence start positions (overlaps counted), df = number of
        matching docs (global — all runs are gathered here), score = the
        pluggable scorer's idf(df) * tf_weight(tf, dl, avgdl); ties broken
        by ascending doc_id.

        Evaluation is fully vectorized: candidate docs = sorted-array
        intersection of the terms' doc lists (rarest first); adjacency via
        intersection of (doc, pos - slot) key sets, with positions decoded
        LAZILY only for blocks holding candidate postings."""
        if not all(m.get("positions") for m in self.metas):
            raise ValueError(
                "phrase queries require an index built with positions=True"
            )
        terms = self._tok.tokenize(text)
        if not terms or k <= 0:
            return []
        post: dict[str, _PhrasePostings] = {}
        for t in set(terms):
            rows = self.term_runs(t)
            if not rows:
                return []
            post[t] = _PhrasePostings(rows, self.block_size)
        ts = sorted(post, key=lambda t: post[t].docs.size)
        cand = post[ts[0]].docs
        for t in ts[1:]:
            cand = cand[np.isin(cand, post[t].docs, assume_unique=True)]
            if cand.size == 0:
                return []
        keys: np.ndarray | None = None
        for i, t in enumerate(terms):
            p = post[t]
            sel = np.searchsorted(p.docs, cand)
            docs_rep, pos_flat = p.positions_for(sel)
            di = np.searchsorted(cand, docs_rep).astype(np.int64)
            m = pos_flat >= i
            # dense candidate index in the high bits keeps the key an
            # int64 (positions < 2^32, |cand| < 2^31)
            ki = (di[m] << np.int64(32)) | (pos_flat[m] - i)
            keys = ki if keys is None else keys[
                np.isin(keys, ki, assume_unique=True)
            ]
            if keys.size == 0:
                return []
        di = (keys >> np.int64(32)).astype(np.int64)
        tf = np.bincount(di, minlength=cand.size).astype(np.float64)
        matched = tf > 0
        df = int(matched.sum())
        p0 = post[terms[0]]
        dl = p0.dls[np.searchsorted(p0.docs, cand)].astype(np.float64)
        idf = float(self.scorer.idf(df, self.n_docs))
        scores = idf * self.scorer.tf_weight(tf[matched], dl[matched], self.avgdl)
        docs_m = cand[matched]
        order = scoring.topk_order(docs_m, scores, k)
        return [(int(docs_m[i]), float(scores[i])) for i in order]

    def sloppy_topk(self, text: str, k: int,
                    slop: int = 2) -> list[tuple[int, float]]:
        """Slop-scored phrase retrieval (the Lucene sloppy-PhraseQuery
        shape) over a positional index. PINNED SPEC: for query tokens
        t1..tn IN ORDER, every ADJACENT pair (ti, ti+1) contributes, per
        doc, weight 2^-gap for each position pair (p, q) with q = p + 1
        + gap and 0 <= gap <= slop — dyadic weights, so the weighted
        frequency is EXACT in float64 on both engines (1/(1+gap) would
        drift in the last ulp). The phrase scores as a pseudo-term like
        like phrase_topk: df = docs with tfw > 0 (global), score =
        idf(df) * tf_weight(tfw, dl, avgdl), ties doc_id asc. slop=0 =
        chained-bigram adjacency (NOT full phrase alignment — each pair
        matches independently).

        Vectorized: one (doc<<32|pos) key-set intersection per adjacent
        pair per gap value — (n-1)(slop+1) np.isin passes over unique
        key arrays, no per-doc Python loop."""
        if not all(m.get("positions") for m in self.metas):
            raise ValueError(
                "sloppy-phrase queries require an index built with "
                "positions=True")
        if slop < 0:
            raise ValueError("slop must be >= 0")
        terms = self._tok.tokenize(text)
        if len(terms) < 2:
            raise ValueError("sloppy phrase needs >= 2 query tokens")
        if k <= 0:
            return []
        post: dict[str, _PhrasePostings] = {}
        for t in set(terms):
            rows = self.term_runs(t)
            if not rows:
                return []
            post[t] = _PhrasePostings(rows, self.block_size)
        ts = sorted(post, key=lambda t: post[t].docs.size)
        cand = post[ts[0]].docs
        for t in ts[1:]:
            cand = cand[np.isin(cand, post[t].docs, assume_unique=True)]
            if cand.size == 0:
                return []
        keys: dict[str, np.ndarray] = {}
        for t in post:
            p = post[t]
            sel = np.searchsorted(p.docs, cand)
            docs_rep, pos_flat = p.positions_for(sel)
            di = np.searchsorted(cand, docs_rep).astype(np.int64)
            keys[t] = (di << np.int64(32)) | pos_flat
        tfw = np.zeros(cand.size, dtype=np.float64)
        for a, b in zip(terms, terms[1:]):
            ka, kb = keys[a], keys[b]
            for gap in range(slop + 1):
                hit = ka[np.isin(ka + np.int64(1 + gap), kb,
                                 assume_unique=True)]
                if hit.size:
                    np.add.at(tfw, (hit >> np.int64(32)).astype(np.int64),
                              2.0 ** -gap)
        matched = tfw > 0
        df = int(matched.sum())
        if df == 0:
            return []
        p0 = post[terms[0]]
        dl = p0.dls[np.searchsorted(p0.docs, cand)].astype(np.float64)
        idf = float(self.scorer.idf(df, self.n_docs))
        scores = idf * self.scorer.tf_weight(
            tfw[matched], dl[matched], self.avgdl)
        docs_m = cand[matched]
        order = scoring.topk_order(docs_m, scores, k)
        return [(int(docs_m[i]), float(scores[i])) for i in order]

    def near_topk(self, text: str, k: int, window: int = 4) -> list[tuple[int, float]]:
        """Proximity-filtered conjunctive BM25 over a positional index.

        Pinned semantics: a doc matches iff it contains EVERY distinct
        query term AND there is a position p of the FIRST query term (the
        anchor) such that each other term occurs at some position q with
        |q - p| < window. Matching docs are scored with the ordinary BM25
        sum over the distinct query terms (global per-term df), ties
        broken by ascending doc_id. SQL equivalent: correlated EXISTS per
        non-anchor term with abs(b.p - a.p) < window."""
        if not all(m.get("positions") for m in self.metas):
            raise ValueError(
                "proximity queries require an index built with positions=True"
            )
        terms = list(dict.fromkeys(self._tok.tokenize(text)))  # distinct, ordered
        if not terms or k <= 0:
            return []
        post: dict[str, _PhrasePostings] = {}
        for t in terms:
            rows = self.term_runs(t)
            if not rows:
                return []
            post[t] = _PhrasePostings(rows, self.block_size)
        cand = post[terms[0]].docs
        for t in sorted(terms[1:], key=lambda t: post[t].docs.size):
            cand = cand[np.isin(cand, post[t].docs, assume_unique=True)]
            if cand.size == 0:
                return []
        if len(terms) == 1:
            # degenerate: no proximity constraint — plain single-term BM25
            # (skips the position decode entirely)
            matched = cand
            return self._score_conjunctive(post, terms, matched, k)
        anchor = post[terms[0]]
        d0, p0 = anchor.positions_for(np.searchsorted(anchor.docs, cand))
        di0 = np.searchsorted(cand, d0).astype(np.int64)
        ok = np.ones(len(p0), dtype=bool)
        for t in terms[1:]:
            p = post[t]
            dt, pt = p.positions_for(np.searchsorted(p.docs, cand))
            kt = np.sort(
                (np.searchsorted(cand, dt).astype(np.int64) << np.int64(32)) | pt
            )
            lo_key = (di0 << np.int64(32)) | np.maximum(p0 - window + 1, 0)
            hi_key = (di0 << np.int64(32)) | (p0 + window)
            ok &= np.searchsorted(kt, lo_key) < np.searchsorted(kt, hi_key)
            if not ok.any():
                return []
        matched = np.unique(d0[ok])
        return self._score_conjunctive(post, terms, matched, k)

    def and_topk(self, text: str, k: int) -> list[tuple[int, float]]:
        """Conjunctive (AND) BM25 top-k via posting-list intersection:
        docs containing EVERY distinct query term, scored with the
        ordinary summed BM25 over the distinct terms (global per-term
        df), ties broken by ascending doc_id. Works on any index —
        positions are never decoded; the intersection runs rarest-first
        over the terms' sorted doc arrays, so cost is bounded by the
        rarest term's posting list after the first step. SQL equivalent:
        the bag-of-words scorer plus HAVING count(matched terms) = n."""
        terms = sorted(set(self._tok.tokenize(text)))
        if not terms or k <= 0:
            return []
        post: dict[str, _PhrasePostings] = {}
        for t in terms:
            rows = self.term_runs(t)
            if not rows:
                return []
            post[t] = _PhrasePostings(rows, self.block_size)
        ts = sorted(terms, key=lambda t: post[t].docs.size)
        cand = post[ts[0]].docs
        for t in ts[1:]:
            cand = cand[np.isin(cand, post[t].docs, assume_unique=True)]
            if cand.size == 0:
                return []
        return self._score_conjunctive(post, terms, cand, k)

    def synonym_topk(
        self, text: str, k: int, synonyms: dict[str, list[str]]
    ) -> list[tuple[int, float]]:
        """Query-time synonym expansion: each query term contributes
        itself plus its mapped synonyms to the distinct term set, then
        ordinary disjunctive BM25 — every synonym scores with its OWN
        global df, exactly as if the user had typed it (the analyzer-
        level expansion shape; expansion is one-way, not transitive).
        Unknown synonyms (no postings) drop out silently."""
        terms = set(self._tok.tokenize(text))
        for t in list(terms):
            terms.update(synonyms.get(t, ()))
        runs_by_term = {t: r for t in sorted(terms) if (r := self.term_runs(t))}
        return self._dispatch_topk(runs_by_term, k)

    def search_after(
        self, text: str, k: int, after: tuple[float, int] | None
    ) -> list[tuple[int, float]]:
        """Cursor (deep) pagination: the next ``k`` results STRICTLY
        after the (score, doc_id) cursor in the global (score desc,
        doc_id asc) order — the stateless alternative to offset paging
        (the cursor is the previous page's last hit, so page N+1 never
        re-ships pages 1..N and two clients paging concurrently can't
        skew each other). ``after=None`` returns page 1 (== topk). The
        cursor score must be the engine's own float64 (comparison is
        exact). SQL mirror: row_number window, rank in (cursor_rank,
        cursor_rank + k]."""
        terms = sorted(set(self._tok.tokenize(text)))
        runs_by_term = {t: r for t in terms if (r := self.term_runs(t))}
        if not runs_by_term or k <= 0:
            return []
        if after is None:
            return self._dispatch_topk(runs_by_term, k)
        hits = self._topk_exact(runs_by_term, 1 << 62)  # full sorted order
        s_a, d_a = float(after[0]), int(after[1])
        # anchor on the cursor DOC when it still matches: immune to the
        # cursor score having come from the WAND path, whose float sums
        # can differ from the exact path's by an ulp (different
        # accumulation order) and would shift the strict (s, d) cut
        for i, (d, _s) in enumerate(hits):
            if d == d_a:
                return hits[i + 1:i + 1 + k]
        start = len(hits)
        for i, (d, s) in enumerate(hits):
            if s < s_a or (s == s_a and d > d_a):
                start = i
                break
        return hits[start:start + k]

    def explain(
        self, text: str, k: int
    ) -> list[tuple[int, str, float, int, float]]:
        """Score breakdown for the top-k result page: one row per
        (result doc, matched query term) with the term's tf in the doc,
        global df, and its BM25 contribution — the relevance-debugging
        surface ("why is this hit first?"). The doc set is EXACTLY
        topk(text, k); contributions sum to each doc's score. Rows
        ordered (doc_id asc, term asc). SQL mirror: the per-term scorer
        CTE before its GROUP BY sum, joined to the ranked top-k."""
        terms = sorted(set(self._tok.tokenize(text)))
        runs_by_term = {t: r for t in terms if (r := self.term_runs(t))}
        hits = self._dispatch_topk(runs_by_term, k)
        if not hits:
            return []
        docs = np.sort(np.array([d for d, _ in hits], dtype=np.int64))
        out: list[tuple[int, str, float, int, float]] = []
        for t in sorted(runs_by_term):
            p = _PhrasePostings(runs_by_term[t], self.block_size)
            sel = np.searchsorted(p.docs, docs)
            inb = sel < p.docs.size
            present = inb.copy()
            present[inb] = p.docs[sel[inb]] == docs[inb]
            if not present.any():
                continue
            df = int(p.docs.size)
            idf = float(self.scorer.idf(df, self.n_docs))
            tfs = p.tfs[sel[present]].astype(np.float64)
            contrib = idf * self.scorer.tf_weight(
                tfs, p.dls[sel[present]].astype(np.float64), self.avgdl
            )
            for d, tf, c in zip(docs[present], tfs, contrib):
                out.append((int(d), t, float(tf), df, float(c)))
        out.sort(key=lambda r: (r[0], r[1]))
        return out

    def msm_topk(
        self, text: str, k: int, min_match: int
    ) -> list[tuple[int, float]]:
        """min_should_match retrieval: ordinary disjunctive BM25, but a
        doc qualifies only if it contains at least ``min_match`` DISTINCT
        query terms. min_match=1 is plain disjunctive top-k and
        min_match=len(distinct terms) is conjunctive AND, so this is the
        general dial between OR and AND recall. The restriction applies
        BEFORE truncation. Qualifying docs are found by counting each
        doc's appearances across the terms' (unique) doc arrays; scoring
        adds each present term's contribution via a searchsorted
        membership probe. SQL mirror: the bag-of-words scorer plus
        HAVING count(DISTINCT matched term) >= min_match."""
        return self._weighted_disjunctive(text, k, min_match=min_match)

    def boosted_topk(
        self, text: str, k: int, boosts: dict[str, float]
    ) -> list[tuple[int, float]]:
        """Query-time term boosting (the ``term^w`` operator): ordinary
        disjunctive BM25 with each term's contribution multiplied by its
        boost (missing terms boost 1.0). Boosts reweight RANKING only —
        df/idf stay global. SQL mirror: the scorer CTE with a per-term
        weight joined in."""
        return self._weighted_disjunctive(text, k, boosts=boosts)

    def _weighted_disjunctive(
        self,
        text: str,
        k: int,
        *,
        min_match: int = 1,
        boosts: dict[str, float] | None = None,
    ) -> list[tuple[int, float]]:
        """Shared kernel for msm/boosted retrieval: docs matching at
        least ``min_match`` distinct query terms, scored by the weighted
        BM25 sum over their present terms."""
        if k <= 0:
            return []
        res = self._weighted_scores(text, min_match=min_match, boosts=boosts)
        if res is None:
            return []
        matched, scores = res
        order = scoring.topk_order(matched, scores, k)
        return [(int(matched[i]), float(scores[i])) for i in order]

    def score_all(self, text: str) -> tuple[np.ndarray, np.ndarray] | None:
        """Every matching doc's disjunctive BM25 score, as numpy arrays
        (docs ascending) — the UNTRUNCATED hit-set feed for collapse /
        facet-filter stages. No per-hit Python objects are built, so the
        cost is the posting decode plus a few vectorized passes even
        when a common term matches half the corpus."""
        return self._weighted_scores(text, min_match=1, boosts=None)

    def _weighted_scores(
        self,
        text: str,
        *,
        min_match: int = 1,
        boosts: dict[str, float] | None = None,
    ) -> tuple[np.ndarray, np.ndarray] | None:
        terms = sorted(set(self._tok.tokenize(text)))
        if not terms or min_match < 1:
            return None
        post: dict[str, _PhrasePostings] = {}
        for t in terms:
            rows = self.term_runs(t)
            if rows:
                post[t] = _PhrasePostings(rows, self.block_size)
        if len(post) < min_match:
            return None
        all_docs = np.concatenate([p.docs for p in post.values()])
        docs_u, counts = np.unique(all_docs, return_counts=True)
        matched = docs_u[counts >= min_match]
        if matched.size == 0:
            return None
        scores = np.zeros(len(matched), dtype=np.float64)
        for t, p in post.items():
            sel = np.searchsorted(p.docs, matched)
            inb = sel < p.docs.size
            present = inb.copy()
            present[inb] = p.docs[sel[inb]] == matched[inb]
            if not present.any():
                continue
            w = float((boosts or {}).get(t, 1.0))
            idf = float(self.scorer.idf(int(p.docs.size), self.n_docs))
            scores[present] += w * idf * self.scorer.tf_weight(
                p.tfs[sel[present]].astype(np.float64),
                p.dls[sel[present]].astype(np.float64),
                self.avgdl,
            )
        return matched, scores

    def hit_count(self, text: str) -> int:
        """Exact number of docs matching ANY query term (the "about N
        results" figure) — union of the terms' doc arrays, postings'
        doc ids only (tfs/positions never decoded)."""
        terms = sorted(set(self._tok.tokenize(text)))
        docs: list[np.ndarray] = []
        for t in terms:
            for row in self.term_runs(t):
                docs.append(decode_blocked_deltas(
                    row["doc_ids"], int(row["df"]), self.block_size
                ))
        if not docs:
            return 0
        return int(np.unique(np.concatenate(docs)).size)

    def not_topk(self, text: str, neg_text: str, k: int) -> list[tuple[int, float]]:
        """Boolean NOT: ordinary disjunctive BM25 over ``text``'s distinct
        terms, EXCLUDING every doc that contains any term of ``neg_text``
        (SQL mirror: the bag-of-words scorer plus NOT EXISTS per negated
        term). Exclusion must happen before truncation, so this uses the
        decode-everything exact scorer and subtracts the union of the
        negated terms' doc arrays (sorted-array membership — the negated
        postings' doc ids only, positions/tfs never decoded)."""
        terms = sorted(set(self._tok.tokenize(text)))
        runs_by_term = {t: r for t in terms if (r := self.term_runs(t))}
        if not runs_by_term or k <= 0:
            return []
        hits = self._topk_exact(runs_by_term, 1 << 62)  # all candidates
        neg_terms = sorted(set(self._tok.tokenize(neg_text)))
        neg_docs: list[np.ndarray] = []
        for t in neg_terms:
            for row in self.term_runs(t):
                neg_docs.append(
                    decode_blocked_deltas(
                        row["doc_ids"], int(row["df"]), self.block_size
                    )
                )
        docs = np.fromiter((d for d, _ in hits), dtype=np.int64, count=len(hits))
        scores = np.fromiter((s for _, s in hits), dtype=np.float64, count=len(hits))
        if neg_docs:
            excl = np.unique(np.concatenate(neg_docs))
            keep = ~np.isin(docs, excl)
            docs, scores = docs[keep], scores[keep]
        order = scoring.topk_order(docs, scores, k)
        return [(int(docs[i]), float(scores[i])) for i in order]

    def bool_topk(self, expr: str, k: int) -> list[tuple[int, float]]:
        """Nested boolean retrieval (a Lucene-style query DSL). Pinned
        grammar: ``OR`` binds loosest; ``AND`` and binary ``NOT``
        (``x NOT y`` = x minus y) bind tighter, left-associative;
        adjacent operands imply ``AND``; parentheses group. An atom is
        run through the query tokenizer and its terms are ANDed (an atom
        with a missing term matches nothing). Scoring is disjunctive
        BM25 over the distinct POSITIVE-context terms — context parity
        flips across each NOT's right operand — so negated terms filter
        but never score; a matched doc containing no positive term keeps
        score 0.0. Ties: score desc, doc_id asc. Malformed expressions
        (unbalanced parens, dangling operators) return [] rather than
        raising — a bad query must not kill the serving actor. SQL
        mirror: per-query EXISTS predicates over the term table plus the
        bag-of-words scorer left-joined on the positive term list."""
        import re as _re

        if k <= 0:
            return []
        toks: list = []
        for m in _re.finditer(r"\(|\)|[^\s()]+", expr):
            s = m.group(0)
            toks.append(
                s if s in ("(", ")", "AND", "OR", "NOT") else ("atom", s))

        def _unary(i):
            if i < len(toks) and toks[i] == "(":
                node, i = _or(i + 1)
                if i >= len(toks) or toks[i] != ")":
                    raise ValueError("unbalanced paren")
                return node, i + 1
            if i < len(toks) and isinstance(toks[i], tuple):
                return ("atom", self._tok.tokenize(toks[i][1])), i + 1
            raise ValueError("expected operand")

        def _and(i):
            node, i = _unary(i)
            while i < len(toks) and (
                toks[i] in ("AND", "NOT") or toks[i] == "("
                or isinstance(toks[i], tuple)
            ):
                if toks[i] == "AND":
                    rhs, i = _unary(i + 1)
                    node = ("and", node, rhs)
                elif toks[i] == "NOT":
                    rhs, i = _unary(i + 1)
                    node = ("not", node, rhs)
                else:  # implicit AND between adjacent operands
                    rhs, i = _unary(i)
                    node = ("and", node, rhs)
            return node, i

        def _or(i):
            node, i = _and(i)
            while i < len(toks) and toks[i] == "OR":
                rhs, i = _and(i + 1)
                node = ("or", node, rhs)
            return node, i

        try:
            tree, end = _or(0)
            if end != len(toks):
                raise ValueError("trailing tokens")
        except ValueError:
            return []

        # one postings load per distinct term (positive or negative)
        post: dict[str, _PhrasePostings | None] = {}
        pos_terms: set[str] = set()

        def _walk(node, parity: int) -> None:
            if node[0] == "atom":
                for t in node[1]:
                    if t not in post:
                        rows = self.term_runs(t)
                        post[t] = (
                            _PhrasePostings(rows, self.block_size)
                            if rows else None
                        )
                    if parity == 0:
                        pos_terms.add(t)
                return
            _walk(node[1], parity)
            _walk(node[2], parity ^ (node[0] == "not"))

        _walk(tree, 0)
        empty = np.empty(0, dtype=np.int64)

        def _eval(node) -> np.ndarray:
            if node[0] == "atom":
                if not node[1]:
                    return empty
                out: np.ndarray | None = None
                for t in node[1]:
                    p = post[t]
                    if p is None:
                        return empty
                    out = p.docs if out is None else np.intersect1d(
                        out, p.docs, assume_unique=True)
                return out
            left, right = _eval(node[1]), _eval(node[2])
            if node[0] == "and":
                return np.intersect1d(left, right, assume_unique=True)
            if node[0] == "or":
                return np.union1d(left, right)
            return np.setdiff1d(left, right, assume_unique=True)

        matched = _eval(tree)
        if matched.size == 0:
            return []
        scores = np.zeros(matched.size, dtype=np.float64)
        for t in sorted(pos_terms):
            p = post[t]
            if p is None:
                continue
            sel = np.searchsorted(p.docs, matched)
            inb = sel < p.docs.size
            present = inb.copy()
            present[inb] = p.docs[sel[inb]] == matched[inb]
            if not present.any():
                continue
            idf = float(self.scorer.idf(int(p.docs.size), self.n_docs))
            scores[present] += idf * self.scorer.tf_weight(
                p.tfs[sel[present]].astype(np.float64),
                p.dls[sel[present]].astype(np.float64),
                self.avgdl,
            )
        order = scoring.topk_order(matched, scores, k)
        return [(int(matched[i]), float(scores[i])) for i in order]

    def _score_conjunctive(
        self,
        post: dict[str, _PhrasePostings],
        terms: list[str],
        matched: np.ndarray,
        k: int,
    ) -> list[tuple[int, float]]:
        """Ordinary summed BM25 over ``terms`` for docs known to contain
        every term (tf/dl read from the already-decoded positional
        postings; per-term idf from the global df)."""
        scores = np.zeros(len(matched), dtype=np.float64)
        for t in terms:
            p = post[t]
            sel = np.searchsorted(p.docs, matched)
            idf = float(self.scorer.idf(int(p.docs.size), self.n_docs))
            scores += idf * self.scorer.tf_weight(
                p.tfs[sel].astype(np.float64),
                p.dls[sel].astype(np.float64),
                self.avgdl,
            )
        order = scoring.topk_order(matched, scores, k)
        return [(int(matched[i]), float(scores[i])) for i in order]

    # ---- exact: decode-everything vectorized scoring ----
    def _decoded_run(self, row: dict) -> tuple:
        """(ids, w) for one posting run, LRU-cached by buffer content
        (values-budgeted — see __init__). ``w`` is the query-INDEPENDENT
        BM25 tf-weight array (tf, dl, avgdl are all run/engine
        constants; idf is applied per query as a scalar): caching it —
        and NOT the raw tf/dl arrays, which nothing downstream reads —
        turns per-query scoring of a cached run into one multiply pass
        instead of re-walking tf+dl, and doubles the entries the budget
        holds. At 32 actors per node the tf-weight recompute was the
        dominant memory-bandwidth consumer of the serving sweep."""
        # ALL THREE buffers key the entry: across federated members the
        # same (ids, tfs) bytes could pair with different dls (doc_id is
        # key-derived, content isn't), and a 2-buffer key would alias
        key = (row["doc_ids"], row["tfs"], row["dls"])
        hit = self._decoded_cache.get(key)
        if hit is not None:
            self._decoded_cache.move_to_end(key)
            return hit
        n = int(row["df"])
        ids = decode_blocked_deltas(row["doc_ids"], n, self.block_size)
        tfs = varbyte_decode(row["tfs"]).astype(np.float64)
        dls = varbyte_decode(row["dls"]).astype(np.float64)
        w = self.scorer.tf_weight(tfs, dls, self.avgdl)
        val = (ids, w)
        self._decoded_cache[key] = val
        self._decoded_values += 2 * n
        while self._decoded_values > self._decoded_budget and self._decoded_cache:
            _, old = self._decoded_cache.popitem(last=False)
            self._decoded_values -= 2 * len(old[0])
        return val

    _TOPDOCS_K = 256    # cached ranked depth per single-term entry
    _TOPDOCS_BUDGET = 16 << 20  # bytes, keys (pinned buffers) included

    def _topk_exact(self, runs_by_term: dict[str, list[dict]], k: int) -> list[tuple[int, float]]:
        # a cached entry holds min(_TOPDOCS_K, term df) ranked rows, so
        # with k <= _TOPDOCS_K a hit always answers (k > len only when
        # len == df, i.e. the whole term is cached)
        single = len(runs_by_term) == 1 and k <= self._TOPDOCS_K
        if single:
            tdkey = tuple((r["doc_ids"], r["tfs"], r["dls"])
                          for r in next(iter(runs_by_term.values())))
            hit = self._topdocs_cache.get(tdkey)
            if hit is not None:
                self._topdocs_cache.move_to_end(tdkey)
                ids_c, sc_c = hit
                m = min(k, len(ids_c))
                return [(int(ids_c[i]), float(sc_c[i]))
                        for i in range(m)]
        # Per TERM, a doc appears in exactly one run (salted runs split
        # one index's postings; federated members hold disjoint docs),
        # so a term's merged posting list needs no summation — order
        # runs by first doc_id and concatenate (already globally sorted
        # for range-salted runs; one argsort repairs the interleaved
        # federated case). ACROSS terms, accumulate by O(n) sorted
        # merge: contributions add in the same term order bincount
        # would use, so the float64 sums are bit-identical to the old
        # unique+bincount path (oracle-pinned).
        per_ids: list[np.ndarray] = []
        per_scores: list[np.ndarray] = []
        for term, rows in runs_by_term.items():
            tkey = tuple((r["doc_ids"], r["tfs"], r["dls"]) for r in rows)
            hit = self._term_cache.get(tkey)
            if hit is not None:
                self._term_cache.move_to_end(tkey)
                per_ids.append(hit[0])
                per_scores.append(hit[1])
                continue
            df = sum(int(r["df"]) for r in rows)
            w_idf = float(self.scorer.idf(df, self.n_docs))
            t_ids: list[np.ndarray] = []
            t_sc: list[np.ndarray] = []
            for row in rows:
                ids, w = self._decoded_run(row)
                if len(ids):
                    t_ids.append(ids)
                    t_sc.append(w_idf * w)
            if not t_ids:
                continue
            if len(t_ids) == 1:
                ti, ts = t_ids[0], t_sc[0]
            else:
                order = sorted(range(len(t_ids)),
                               key=lambda i: int(t_ids[i][0]))
                ti = np.concatenate([t_ids[i] for i in order])
                ts = np.concatenate([t_sc[i] for i in order])
                if not np.all(ti[1:] > ti[:-1]):
                    o2 = np.argsort(ti, kind="stable")
                    ti, ts = ti[o2], ts[o2]
            self._term_cache[tkey] = (ti, ts)
            self._term_values += 2 * len(ti)
            while self._term_values > self._term_budget and self._term_cache:
                _, old = self._term_cache.popitem(last=False)
                self._term_values -= 2 * len(old[0])
            per_ids.append(ti)
            per_scores.append(ts)
        if not per_ids:
            return []
        # cached arrays are shared across queries: merge_scored_runs
        # copies before mutating and adds in the bincount order
        uniq, sums = scoring.merge_scored_runs(per_ids, per_scores)
        if single:
            # fill the top-docs entry at cache depth (one extra
            # argpartition now, O(k) forever after for this term);
            # budget counts the VALUE arrays plus the raw key buffers
            # the entry pins — the keys dominate for mid-df terms
            deep = scoring.topk_order(uniq, sums, self._TOPDOCS_K)
            entry = (uniq[deep].copy(), sums[deep].copy())
            self._topdocs_cache[tdkey] = entry
            self._topdocs_bytes += self._topdocs_entry_bytes(tdkey, entry)
            while (self._topdocs_bytes > self._TOPDOCS_BUDGET
                   and self._topdocs_cache):
                okey, oval = self._topdocs_cache.popitem(last=False)
                self._topdocs_bytes -= self._topdocs_entry_bytes(okey, oval)
            return [(int(uniq[i]), float(sums[i])) for i in deep[:k]]
        order = scoring.topk_order(uniq, sums, k)
        return [(int(uniq[i]), float(sums[i])) for i in order]

    @staticmethod
    def _topdocs_entry_bytes(key: tuple, val: tuple) -> int:
        return (sum(len(b) for run in key for b in run)
                + val[0].nbytes + val[1].nbytes)

    # ---- block-max WAND with lazy block decode ----
    def _topk_wand(self, runs_by_term: dict[str, list[dict]], k: int) -> list[tuple[int, float]]:
        runs: list[_Run] = []
        for term, rows in runs_by_term.items():
            df = sum(int(r["df"]) for r in rows)
            w_idf = float(self.scorer.idf(df, self.n_docs))
            for row in rows:
                if int(row["df"]) > 0:
                    runs.append(_Run(w_idf, row, self.avgdl, self.block_size,
                                     self.scorer))
        if not runs:
            return []
        try:
            if len(runs_by_term) == 1:
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
