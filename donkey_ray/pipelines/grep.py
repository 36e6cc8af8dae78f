"""Content substring / regex search over a content-trigram index.

Code-search-shaped serving (the public design: R. Cox, "Regular
Expression Matching with a Trigram Index", 2012 — the Google Code
Search postmortem; donkey's capability analogue is content-based
candidate retrieval + exact rerank, SURVEY.md A5/A6):

- BUILD: every document contributes its DISTINCT byte trigrams of
  ``lower(text)`` (utf-8 bytes, so the artifact is encoding-agnostic).
  Extraction is fully vectorized: a batch's docs are joined with a
  ``\\x00\\x00`` separator, numpy sliding windows produce every 3-byte
  gram, windows containing the separator byte are dropped, and
  (doc, gram) pairs are deduped with one ``np.unique`` over packed
  uint64 keys. Grams pack into uint32 (3 bytes), so the posting table
  is pure fixed-width integers. One keyed exchange on ``gram`` lands
  each gram's postings in one partition, written gram-sorted so parquet
  row-group stats prune query reads. A gram->df summary (vocab-sized,
  bounded by min(corpus bytes, 2^24) rows) is kept beside the postings
  for rarest-first probe selection.

- SUBSTRING QUERY: a match of pattern ``p`` (len >= 3) must contain
  every 3-byte window of ``p``, so candidates = the INTERSECTION of the
  window grams' posting sets. Only the ``MAX_PROBES`` rarest windows are
  probed (rarest-first, the Zoekt/codesearch trick) — the intersection
  stays a superset, and verification makes it exact: candidate docs are
  re-read with doc_id pushdown and counted with vectorized
  ``pc.count_substring`` (non-overlapping, same semantics as the SQL
  oracle's replace() length trick). Patterns shorter than 3 bytes fall
  back to the distributed full scan (still vectorized, never row loops).

- REGEX QUERY: a MANDATORY LITERAL run is extracted conservatively from
  the pattern (no alternation/groups, quantified chars excluded); if one
  of length >= 3 exists, its windows prefilter candidates through the
  same index, and the full regex verifies via ``pc.count_substring_regex``
  (RE2 — the engine DuckDB's regexp_* uses). Otherwise the query runs as
  the distributed scan (``analyze.regex_search`` semantics).

Scale posture: the build moves ONE (gram:uint32, doc_id:int64) exchange
whose volume is O(corpus bytes); serving reads O(probed postings) +
O(candidate docs), never a corpus scan. The candidate intersection runs
driver-side over the probed postings only (bounded by the rarest-gram
dfs and guarded by ``max_candidates``); at 100 TB the same intersection
is one more keyed exchange on doc_id — the probe tables already arrive
partition-pruned.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..state import manifest as mf

MAX_PROBES = 8  # rarest windows probed per pattern (necessary condition)


# ---- build ----

def _explode_trigrams(batch: pa.Table) -> pa.Table:
    """(doc_id, text) batch -> distinct (gram:uint32, doc_id:int64) pairs.
    Vectorized: one separator-joined byte buffer, numpy sliding windows,
    one np.unique over packed (doc_idx << 24 | gram) keys."""
    ids = batch.column("doc_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
    texts = pc.utf8_lower(batch.column("text")).to_pylist()
    blobs = [t.encode("utf-8") if t else b"" for t in texts]
    if not blobs:
        return pa.table({"gram": pa.array([], pa.uint32()),
                         "doc_id": pa.array([], pa.int64())})
    joined = b"\x00\x00".join(blobs)
    buf = np.frombuffer(joined, dtype=np.uint8)
    if buf.size < 3:
        return pa.table({"gram": pa.array([], pa.uint32()),
                         "doc_id": pa.array([], pa.int64())})
    win = np.lib.stride_tricks.sliding_window_view(buf, 3)
    valid = (win != 0).all(axis=1)
    # map window start offset -> doc index (docs laid out with +2 sep)
    lens = np.fromiter((len(b) for b in blobs), dtype=np.int64,
                       count=len(blobs))
    starts = np.zeros(len(blobs), dtype=np.int64)
    np.cumsum(lens[:-1] + 2, out=starts[1:])
    pos = np.nonzero(valid)[0]
    doc_idx = np.searchsorted(starts, pos, side="right") - 1
    w = win[pos].astype(np.uint64)
    gram = (w[:, 0] << np.uint64(16)) | (w[:, 1] << np.uint64(8)) | w[:, 2]
    key = np.unique((doc_idx.astype(np.uint64) << np.uint64(24)) | gram)
    return pa.table({
        "gram": pa.array((key & np.uint64(0xFFFFFF)).astype(np.uint32)),
        "doc_id": pa.array(ids[(key >> np.uint64(24)).astype(np.int64)]),
    })


def build_content_trigram_index(ds: ray.data.Dataset, out: str) -> str:
    """Build (once; marker-resumable) the content-trigram artifact:
    postings-*.parquet (gram:uint32, doc_id:int64) gram-sorted, plus
    gram_df.parquet (gram, df) for rarest-first probe selection."""
    import shutil

    import pyarrow.parquet as pq

    from ..stages.exchange import keyed_partition_map

    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    exploded = ds.map_batches(
        _explode_trigrams, batch_format="pyarrow", zero_copy_batch=True
    )

    def write_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"gram": pa.array([], pa.uint32()),
                             "df": pa.array([], pa.int64())})
        part = part.sort_by([("gram", "ascending"), ("doc_id", "ascending")])
        # deterministic name (a gram lives in exactly one partition, so the
        # min gram is partition-unique): re-execution and Ray task RETRIES
        # overwrite the same file with identical bytes instead of duplicating
        lo = part.column("gram")[0].as_py()
        hi = part.column("gram")[part.num_rows - 1].as_py()
        name = f"postings-{lo:06x}-{hi:06x}.parquet"
        tmp = os.path.join(out, "." + name)
        pq.write_table(part, tmp, row_group_size=4096)
        os.rename(tmp, os.path.join(out, name))
        df = part.group_by("gram", use_threads=False).aggregate(
            [("doc_id", "count")]
        )
        return pa.table({"gram": df.column("gram"),
                         "df": df.column("doc_id_count").cast(pa.int64())})

    write_part.__name__ = "grep_trigram_write"
    from ..util import dataset_to_table

    dfs = dataset_to_table(
        keyed_partition_map(exploded, ["gram"], write_part)
    ).sort_by([("gram", "ascending")])
    tmp = os.path.join(out, ".gram_df.parquet")
    pq.write_table(dfs, tmp)
    os.rename(tmp, os.path.join(out, "gram_df.parquet"))
    mf.atomic_write_json(
        os.path.join(out, "meta.json"),
        {"n_grams": dfs.num_rows, "total_postings": int(pc.sum(dfs.column("df")).as_py() or 0)},
    )
    mf.atomic_write_bytes(marker, b"")
    return out


# ---- query ----

@lru_cache(maxsize=8)
def _gram_df_at(index_dir: str, _mtime_ns: int) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(index_dir, "gram_df.parquet"))
    return (t.column("gram").to_numpy().astype(np.uint32),
            t.column("df").to_numpy())


def _gram_df(index_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Cache keyed by (dir, _DONE mtime) so an in-process REBUILD of the
    artifact (marker cleared + rewritten) never serves the stale vocab —
    a stale absent-gram verdict is 'proof of zero matches' downstream."""
    mt = os.stat(os.path.join(index_dir, "_DONE")).st_mtime_ns
    return _gram_df_at(index_dir, mt)


def _pattern_grams(pat_bytes: bytes) -> np.ndarray:
    buf = np.frombuffer(pat_bytes, dtype=np.uint8)
    win = np.lib.stride_tricks.sliding_window_view(buf, 3).astype(np.uint64)
    g = (win[:, 0] << np.uint64(16)) | (win[:, 1] << np.uint64(8)) | win[:, 2]
    return np.unique(g).astype(np.uint32)


def substring_candidates(
    index_dir: str, literal: str, *, max_candidates: int = 1_000_000
) -> np.ndarray | None:
    """doc_ids possibly containing ``literal`` (a SUPERSET — callers must
    verify), via rarest-first probed posting intersection. Returns None
    when the literal is shorter than 3 bytes (index can't route it);
    returns an empty array when some window gram is absent (proof of
    zero matches — no verification read needed)."""
    import pyarrow.dataset as pads

    lit = literal.encode("utf-8")
    if len(lit) < 3:
        return None
    grams = _pattern_grams(lit)
    vocab, dfs = _gram_df(index_dir)
    if len(vocab) == 0:
        return np.array([], dtype=np.int64)
    idx = np.searchsorted(vocab, grams)
    present = (idx < len(vocab)) & (vocab[np.minimum(idx, len(vocab) - 1)] == grams)
    if not present.all():
        return np.array([], dtype=np.int64)
    order = np.argsort(dfs[idx], kind="stable")
    probes = grams[order[:MAX_PROBES]]
    files = [os.path.join(index_dir, f) for f in sorted(os.listdir(index_dir))
             if f.startswith("postings-")]
    hits = pads.dataset(files).to_table(
        columns=["gram", "doc_id"],
        filter=pads.field("gram").isin([int(g) for g in probes]),
    )
    counts = hits.group_by("doc_id", use_threads=False).aggregate(
        [("gram", "count")]
    )
    cand = counts.filter(
        pc.equal(counts.column("gram_count"), len(probes))
    ).column("doc_id").to_numpy()
    if len(cand) > max_candidates:
        raise ValueError(
            f"substring {literal!r} produced {len(cand)} candidates "
            f"(> {max_candidates})"
        )
    return np.sort(cand)


def substring_search(
    docs: ray.data.Dataset | None,
    index_dir: str,
    patterns: list[tuple[int, str]],
    *,
    docs_path: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Indexed case-insensitive grep: (pattern_id, doc_id, n_hits) for
    every doc containing each pattern (n_hits = non-overlapping count,
    replace()-trick semantics). Patterns the index can route read ONLY
    their candidate docs (doc_id-pushdown parquet read); sub-trigram
    patterns verify via the distributed full scan of ``docs``."""
    import pyarrow.dataset as pads

    routed: dict[int, np.ndarray] = {}
    scan_pats: list[tuple[int, str]] = []
    for pid, pat in patterns:
        cand = substring_candidates(index_dir, pat.lower())
        if cand is None:
            scan_pats.append((pid, pat))
        elif len(cand):
            routed[pid] = cand

    def count_hits(batch: pa.Table, pats: list[tuple[int, str]],
                   masks: dict[int, np.ndarray] | None) -> pa.Table:
        low = pc.utf8_lower(batch.column(text_col))
        if isinstance(low, pa.ChunkedArray):
            low = low.combine_chunks()
        ids = batch.column(id_col).cast(pa.int64())
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        parts = []
        for pid, pat in pats:
            n = pc.count_substring(low, pat.lower()).cast(pa.int64())
            hit = pc.greater(n, 0)
            if isinstance(hit, pa.ChunkedArray):
                hit = hit.combine_chunks()
            if masks is not None:
                in_cand = pc.is_in(
                    ids, value_set=pa.array(masks[pid], pa.int64())
                )
                hit = pc.and_(hit, in_cand)
            parts.append(pa.table({
                "pattern_id": pa.array(
                    np.full(len(ids), pid, dtype=np.int64)).filter(hit),
                "doc_id": ids.filter(hit),
                "n_hits": n.filter(hit),
            }))
        return pa.concat_tables(parts)

    out: list[pa.Table] = []
    if routed:
        union = np.unique(np.concatenate(list(routed.values())))
        frag = pads.dataset(docs_path).to_table(
            columns=[id_col, text_col],
            filter=pads.field(id_col).isin(union.tolist()),
        )
        cand_ds = ray.data.from_arrow(frag)
        pats = [(pid, dict(patterns)[pid]) for pid in routed]
        res = cand_ds.map_batches(
            lambda b: count_hits(b, pats, routed),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        from ..util import dataset_to_table

        out.append(dataset_to_table(res))
    if scan_pats:
        from ..util import dataset_to_table

        res = docs.map_batches(
            lambda b: count_hits(b, scan_pats, None),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        out.append(dataset_to_table(res))
    schema = pa.schema([("pattern_id", pa.int64()), ("doc_id", pa.int64()),
                        ("n_hits", pa.int64())])
    if not out:
        return schema.empty_table()
    return pa.concat_tables([t.cast(schema) for t in out]).sort_by(
        [("pattern_id", "ascending"), ("doc_id", "ascending")]
    )


# ---- regex over the index ----

_METAS = set(".^$*+?{}[]()|\\")
_QUANTS = set("*?{")


def mandatory_literal(pattern: str) -> str | None:
    """Longest literal run every match must contain, or None. Conservative:
    alternation or groups anywhere -> None (their contents may be
    optional); a literal char directly followed by ``* ? {`` is excluded
    from its run (``+`` keeps it — one occurrence is mandatory — but
    terminates the run); escapes/classes break runs."""
    if "|" in pattern or "(" in pattern:
        return None
    runs: list[str] = []
    cur: list[str] = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\":
            runs.append("".join(cur))
            cur = []
            i += 2
            continue
        if c in _METAS:
            runs.append("".join(cur))
            cur = []
            if c == "[":  # skip the class body
                j = pattern.find("]", i + 1)
                i = (j if j != -1 else len(pattern)) + 1
            elif c == "{":  # skip the quantifier body: its digits are
                # NOT literal text ('ab{2,3}cd' must never yield '2,3')
                j = pattern.find("}", i + 1)
                i = (j if j != -1 else len(pattern)) + 1
            else:
                i += 1
            continue
        if i + 1 < len(pattern) and pattern[i + 1] in _QUANTS:
            runs.append("".join(cur))
            cur = []
            i += 1  # the quantifier itself is a meta, handled next loop
            continue
        cur.append(c)
        i += 1
    runs.append("".join(cur))
    best = max(runs, key=len, default="")
    return best if len(best) >= 3 else None


def regex_search_indexed(
    docs: ray.data.Dataset,
    index_dir: str,
    patterns: list[tuple[int, str]],
    *,
    docs_path: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Indexed grep -E: per (pattern_id, RE2 pattern), every doc with
    >= 1 non-overlapping match + count. Case-sensitive over raw text
    (same semantics as analyze.regex_search / the SQL oracle); index
    routing requires the mandatory literal lowercase-insensitive, so
    literals are lowered for candidate lookup and the full regex
    verifies on the raw text — still a superset, still exact."""
    import pyarrow.dataset as pads

    routed: dict[int, np.ndarray] = {}
    scan_pats: list[tuple[int, str]] = []
    for pid, pat in patterns:
        lit = mandatory_literal(pat)
        cand = (substring_candidates(index_dir, lit.lower())
                if lit is not None else None)
        if cand is None:
            scan_pats.append((pid, pat))
        elif len(cand):
            routed[pid] = cand

    def count_hits(batch: pa.Table, pats: list[tuple[int, str]],
                   masks: dict[int, np.ndarray] | None) -> pa.Table:
        col = batch.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ids = batch.column(id_col).cast(pa.int64())
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        parts = []
        for pid, pat in pats:
            n = pc.count_substring_regex(col, pat).cast(pa.int64())
            hit = pc.greater(n, 0)
            if isinstance(hit, pa.ChunkedArray):
                hit = hit.combine_chunks()
            if masks is not None:
                hit = pc.and_(hit, pc.is_in(
                    ids, value_set=pa.array(masks[pid], pa.int64())))
            parts.append(pa.table({
                "pattern_id": pa.array(
                    np.full(len(ids), pid, dtype=np.int64)).filter(hit),
                "doc_id": ids.filter(hit),
                "n_matches": n.filter(hit),
            }))
        return pa.concat_tables(parts)

    from ..util import dataset_to_table

    out: list[pa.Table] = []
    if routed:
        union = np.unique(np.concatenate(list(routed.values())))
        frag = pads.dataset(docs_path).to_table(
            columns=[id_col, text_col],
            filter=pads.field(id_col).isin(union.tolist()),
        )
        pats = [(pid, dict(patterns)[pid]) for pid in routed]
        out.append(dataset_to_table(ray.data.from_arrow(frag).map_batches(
            lambda b: count_hits(b, pats, routed),
            batch_format="pyarrow", zero_copy_batch=True,
        )))
    if scan_pats:
        out.append(dataset_to_table(docs.map_batches(
            lambda b: count_hits(b, scan_pats, None),
            batch_format="pyarrow", zero_copy_batch=True,
        )))
    schema = pa.schema([("pattern_id", pa.int64()), ("doc_id", pa.int64()),
                        ("n_matches", pa.int64())])
    if not out:
        return schema.empty_table()
    return pa.concat_tables([t.cast(schema) for t in out]).sort_by(
        [("pattern_id", "ascending"), ("doc_id", "ascending")]
    )
