"""Extraction stages: doc metadata + exploded postings (SURVEY.md B6-B8, B12).

Donkey analogue [PK]: ``Extractor::extract(raw) -> Object`` (plugin header,
see SURVEY.md section 0) — here the 'features' are (term, tf) pairs and the
extractor is the per-lang tokenizer registry. Stateful setup (compiled
regexes, hot-term table) happens once per actor in ``__init__``; per-batch
work is vectorized Arrow/numpy.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import stable_term_hash
from ..functions.tokenize import get_tokenizer


def _doc_ids_for_batch(batch: pa.Table, id_col: str | None) -> np.ndarray:
    if id_col and id_col in batch.column_names:
        return batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    repo = batch.column("repo").to_pylist()
    path = batch.column("path").to_pylist()
    commit = batch.column("commit").to_pylist()
    mask = (1 << 63) - 1
    out = np.empty(len(repo), dtype=np.int64)
    for i in range(len(repo)):
        h = hashlib.sha256()
        h.update(repo[i].encode())
        h.update(b"\x00")
        h.update(path[i].encode())
        h.update(b"\x00")
        h.update(commit[i].encode())
        out[i] = int.from_bytes(h.digest()[:8], "big") & mask
    return out


def _doc_len_column(batch: pa.Table, analyzer: str | None) -> pa.Array:
    """Tokenized doc length per row, mirroring the extractor's analyzer
    routing: ``analyzer`` (= build's analyzer_lang/query_lang override)
    pins one tokenizer; None routes each row through the per-lang
    registry exactly like PostingsExtractor. Uses the tokenizers'
    count-scan path (no token-list materialization), so the docs pass
    stays cheap."""
    content = batch.column("content").combine_chunks()
    if analyzer is not None:
        return get_tokenizer(analyzer).count_column(content)
    lang_arr = batch.column("lang").combine_chunks()
    out = np.zeros(batch.num_rows, dtype=np.int64)
    for lg in pc.unique(lang_arr).to_pylist():
        mask = (pc.is_null(lang_arr) if lg is None
                else pc.equal(lang_arr, lg)).to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(mask)
        cnt = get_tokenizer(lg or "simple").count_column(content.take(idx))
        out[idx] = np.asarray(cnt.to_numpy(zero_copy_only=False),
                              dtype=np.int64)
    return pa.array(out, pa.int64())


def doc_meta(batch: pa.Table, *, id_col: str | None = None,
             analyzer: str | None = None,
             with_doc_len: bool = True) -> pa.Table:
    """Corpus batch -> DOCS-schema batch (sha256 carried, content dropped).

    Embarrassingly parallel; preserves the per-row sha256(content)
    invariant (BASELINE.json input_hint). ``doc_len`` is the tokenized
    length under the build's analyzer (SURVEY §1.2 per-lang stats feed);
    ``analyzer`` mirrors build_index's analyzer_lang/query_lang
    precedence, None = per-row registry routing."""
    doc_ids = _doc_ids_for_batch(batch, id_col)
    content = batch.column("content")
    sha = pa.array(
        [hashlib.sha256(v.encode()).hexdigest() if v is not None else None
         for v in content.to_pylist()],
        pa.string(),
    )
    cols = {
        "doc_id": pa.array(doc_ids, pa.int64()),
        "repo": batch.column("repo"),
        "path": batch.column("path"),
        "commit": batch.column("commit"),
        "lang": batch.column("lang"),
        "content_sha256": sha,
        "n_chars": pc.utf8_length(content).cast(pa.int64()),
    }
    if with_doc_len:
        cols["doc_len"] = _doc_len_column(batch, analyzer)
    return pa.table(cols)


# per-worker-process extractor cache: tasks get actor-like amortization of
# setup (hot-term routing table, compiled regexes) without actor-pool
# startup latency. Keyed by config; hot set resolved from the object store
# once per process.
_EXTRACTOR_CACHE: dict = {}


def extract_postings(batch: pa.Table, *, num_partitions: int, hot_ref=None,
                     salt_bits: int = 4, id_col: str | None = None,
                     combine: bool = False, positions: bool = False,
                     lang_override: str | None = None) -> pa.Table:
    key = (
        num_partitions,
        hot_ref.hex() if hot_ref is not None else None,
        salt_bits,
        id_col,
        combine,
        positions,
        lang_override,
    )
    ex = _EXTRACTOR_CACHE.get(key)
    if ex is None:
        import ray

        hot = ray.get(hot_ref) if hot_ref is not None else None
        ex = PostingsExtractor(
            num_partitions, hot_terms=hot, salt_bits=salt_bits, id_col=id_col,
            combine=combine, positions=positions, lang_override=lang_override,
        )
        _EXTRACTOR_CACHE.clear()  # one live config per worker is enough
        _EXTRACTOR_CACHE[key] = ex
    return ex(batch)


class PostingsExtractor:
    """Actor-pool stage: corpus batches -> exploded (term, doc_id, tf, dl,
    part) postings batches (SURVEY.md B12/B15/B18).

    Partition routing: part = blake2b(term) % P, except hot (high-df) terms
    which are salted by the TOP ``salt_bits`` bits of doc_id so each salted
    run covers a contiguous doc_id range (merge = range concat, B17/B18).
    The hot-term routing table is built once per actor in __init__.
    """

    def __init__(
        self,
        num_partitions: int,
        hot_terms=None,
        salt_bits: int = 4,
        id_col: str | None = None,
        emit_part: bool = True,
        combine: bool | None = None,
        positions: bool = False,
        lang_override: str | None = None,
    ) -> None:
        import ray

        self.num_partitions = int(num_partitions)
        self.salt_bits = int(salt_bits)
        self.id_col = id_col
        self.emit_part = emit_part
        # positional postings (phrase/proximity queries): each output row
        # additionally carries ``pos`` = varbyte(delta(token positions of
        # this (term, doc))) — a self-contained cell, so the shuffle and
        # the segment encoder treat it as an opaque byte string
        self.positions = bool(positions)
        if self.positions and combine:
            raise ValueError("positions=True is incompatible with the "
                             "map-side combiner (combine=True)")
        # map-side combiner: ship pre-encoded varbyte runs instead of raw
        # rows (~3x fewer shuffle bytes). Wins when the exchange is
        # network-bound (real clusters); in THIS sandbox Ray's sort
        # shuffle handles many small binary cells poorly, so default off.
        self.combine = False if combine is None else combine
        if hot_terms is not None and isinstance(hot_terms, ray.ObjectRef):
            hot_terms = ray.get(hot_terms)
        self.hot_parts: dict[str, np.ndarray] = {}
        for t in hot_terms or ():
            salts = np.empty(1 << self.salt_bits, dtype=np.int32)
            for s in range(1 << self.salt_bits):
                salts[s] = int.from_bytes(
                    hashlib.blake2b(
                        t.encode() + b"#" + int(s).to_bytes(8, "big"), digest_size=8
                    ).digest(),
                    "big",
                ) % self.num_partitions
            self.hot_parts[t] = salts
        self._part_cache: dict[str, int] = {}
        self._tokenizers = {}
        # analyzer override: when set, EVERY row tokenizes through this
        # analyzer regardless of its lang column (stem/fold indexes —
        # index-side terms must come from the same analyzer queries use;
        # None keeps the per-lang registry routing, the default)
        self.lang_override = lang_override

    def _tokenizer(self, lang: str):
        if self.lang_override is not None:
            lang = self.lang_override
        tok = self._tokenizers.get(lang)
        if tok is None:
            tok = self._tokenizers[lang] = get_tokenizer(lang)
        return tok

    def _cold_part(self, term: str) -> int:
        p = self._part_cache.get(term)
        if p is None:
            if len(self._part_cache) > 2_000_000:
                self._part_cache.clear()
            p = self._part_cache[term] = stable_term_hash(term) % self.num_partitions
        return p

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = _doc_ids_for_batch(batch, self.id_col)
        langs = batch.column("lang").to_numpy(zero_copy_only=False)
        content = batch.column("content")

        term_arrs: list[pa.Array] = []
        row_arrs: list[np.ndarray] = []
        pos_arrs: list[np.ndarray] = []
        dl_batch = np.zeros(batch.num_rows, dtype=np.int64)
        for lang in np.unique(langs):
            idx = np.flatnonzero(langs == lang)
            sub = content.take(pa.array(idx))
            flat, parents, dl = self._tokenizer(str(lang)).tokenize_column(sub)
            term_arrs.append(flat)
            row_arrs.append(idx[parents])
            dl_batch[idx] = dl
            if self.positions:
                # token position within its doc: tokenize_column yields
                # tokens in doc order with nondecreasing parents, so
                # pos = global index - first index of the parent's run
                pos_arrs.append(
                    np.arange(len(parents), dtype=np.int64)
                    - np.searchsorted(parents, parents)
                )

        if not term_arrs or sum(len(a) for a in term_arrs) == 0:
            empty = {
                "term": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "tf": pa.array([], pa.int32()),
                "dl": pa.array([], pa.int32()),
            }
            if self.positions:
                empty["pos"] = pa.array([], pa.binary())
            empty["part"] = pa.array([], pa.int32())
            return pa.table(empty)

        pos_cells: list[bytes] | None = None
        if self.positions:
            rows, terms, tf, pos_cells = self._group_with_positions(
                term_arrs, row_arrs, pos_arrs
            )
        else:
            tokens = pa.table(
                {
                    "term": pa.concat_arrays(
                        [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                         for a in term_arrs]
                    ),
                    "row": pa.array(np.concatenate(row_arrs), pa.int64()),
                }
            )
            # vectorized tf per (row, term): Arrow hash-groupby
            grouped = tokens.group_by(["row", "term"], use_threads=False).aggregate(
                [("term", "count")]
            )
            rows = grouped.column("row").to_numpy(zero_copy_only=False)
            terms = grouped.column("term")
            tf = grouped.column("term_count").to_numpy(zero_copy_only=False).astype(np.int32)

        out_doc_ids = doc_ids[rows]
        out_dl = dl_batch[rows].astype(np.int32)

        cols = {
            "term": terms,
            "doc_id": pa.array(out_doc_ids, pa.int64()),
            "tf": pa.array(tf, pa.int32()),
            "dl": pa.array(out_dl, pa.int32()),
        }
        if pos_cells is not None:
            cols["pos"] = pa.array(pos_cells, pa.binary())
        if not self.emit_part:
            return pa.table(cols)

        # route per unique term (cached); salt hot terms by doc_id top bits
        term_np = terms.to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(term_np, return_inverse=True)
        base = np.fromiter(
            (self._cold_part(t) for t in uniq), dtype=np.int32, count=len(uniq)
        )
        part = base[inv]
        if self.hot_parts:
            salts = (out_doc_ids >> (63 - self.salt_bits)).astype(np.int64)
            for j, t in enumerate(uniq):
                table = self.hot_parts.get(t)
                if table is not None:
                    m = inv == j
                    part[m] = table[salts[m]]
        if not self.combine:
            cols["part"] = pa.array(part, pa.int32())
            return pa.table(cols)
        return self._combine_runs(
            uniq, inv.astype(np.int64), part, out_doc_ids, tf, out_dl
        )

    def _group_with_positions(self, term_arrs, row_arrs, pos_arrs):
        """(row, term) aggregation that also emits each posting's encoded
        position list. numpy lexsort replaces the Arrow hash-groupby so the
        per-group positions stay doc-ordered; the cell bytes are produced
        by ONE vectorized codec pass over all groups."""
        from ..functions.codec import (
            delta_encode_segments,
            varbyte_encode_segments,
        )

        terms_flat = pa.concat_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
             for a in term_arrs]
        )
        rows_flat = np.concatenate(row_arrs)
        pos_flat = np.concatenate(pos_arrs)
        dict_arr = terms_flat.dictionary_encode()
        codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((pos_flat, codes, rows_flat))
        rows_s = rows_flat[order]
        codes_s = codes[order]
        pos_s = pos_flat[order].astype(np.uint64)
        n = len(order)
        change = (rows_s[1:] != rows_s[:-1]) | (codes_s[1:] != codes_s[:-1])
        starts = np.concatenate(([0], np.flatnonzero(change) + 1))
        ends = np.concatenate((starts[1:], [n]))
        tf = (ends - starts).astype(np.int32)
        cells = varbyte_encode_segments(
            delta_encode_segments(pos_s, starts), starts
        )
        terms_g = dict_arr.dictionary.take(pa.array(codes_s[starts]))
        return rows_s[starts], terms_g, tf, cells

    def _combine_runs(self, uniq, term_codes, part, doc_ids, tf, dl) -> pa.Table:
        """Map-side combiner: collapse this batch's postings into per-
        (part, term) pre-encoded runs so the shuffle moves ~2-3 B/posting
        of varbyte instead of ~30 B/posting of raw rows. The delta stream
        resets at run starts, so the reducer decodes ALL runs of a block
        with one vectorized pass (no per-run Python)."""
        from ..functions.codec import (
            delta_encode_segments,
            varbyte_encode_segments,
        )

        order = np.lexsort((doc_ids, term_codes, part))
        part_s = part[order]
        codes_s = term_codes[order]
        ids_s = doc_ids[order].astype(np.uint64)
        tf_s = tf[order].astype(np.uint64)
        dl_s = dl[order].astype(np.uint64)
        n = len(order)
        change = (part_s[1:] != part_s[:-1]) | (codes_s[1:] != codes_s[:-1])
        starts = np.concatenate(([0], np.flatnonzero(change) + 1))
        ends = np.concatenate((starts[1:], [n]))
        docs_b = varbyte_encode_segments(
            delta_encode_segments(ids_s, starts), starts
        )
        tfs_b = varbyte_encode_segments(tf_s, starts)
        dls_b = varbyte_encode_segments(dl_s, starts)
        return pa.table(
            {
                "term": pa.array(uniq[codes_s[starts]], pa.string()),
                "part": pa.array(part_s[starts], pa.int32()),
                "n": pa.array((ends - starts).astype(np.int32), pa.int32()),
                "docs": pa.array(docs_b, pa.binary()),
                "tfs": pa.array(tfs_b, pa.binary()),
                "dls": pa.array(dls_b, pa.binary()),
            }
        )
