"""Static index pruning (Carmel et al. 2001, "Static index pruning for
information retrieval systems") — a LOSSY, smaller physical index.

For each term, only its top ``ceil(keep_frac * df)`` postings by
(tf desc, doc_id asc) survive; everything else — docs table, corpus
stats (n_docs / total_len / avgdl), per-posting dl — is carried through
unchanged, so a surviving posting scores EXACTLY what it scored in the
full index except for the idf shift from the smaller df (the pruned
index is self-consistent: its segments' df column is the pruned count,
and the standard QueryEngine serves it unmodified). The keep rule is
``max(1, ceil(keep_frac * df - 1e-9))`` — the epsilon guards float
ceil at exact multiples (same guard as the PPJoin prefix length), and
every term keeps at least one posting so the vocabulary is preserved.

Why: high-df terms dominate index bytes but their low-tf postings
rarely reach the top-k; pruning trades bounded recall for a smaller,
faster index — the classic size/latency dial for serving fleets.

Scale shape: ONE decode pass over the source segments (partition files
read in parallel), one term-keyed exchange (the same hash partitioning
as a build — a term's postings must co-locate for the global keep
rule), and the per-partition prune is a single lexsort + segmented
rank; the docs table is copied via a streaming read->write.

Known skew ceiling (documented, not yet needed at tested scale): the
co-locating exchange un-salts hot terms, so the owner partition of the
single hottest term receives keep_frac * df rows where the salted build
split them 2^salt_bits ways. Bounded refinement for the 100 TB path:
per-(term, salt-shard) tf histograms (run metadata only, no posting
bytes) -> merged per-term threshold tf* -> shards keep tf > tf* locally
and exchange ONLY the tf == tf* boundary postings for the exact
(doc asc) tie cut, writing the hot term's pruned postings still salted.
"""

from __future__ import annotations

import glob as _glob
import os

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .. import schemas
from ..state import manifest as mf
from .incremental import segments_as_postings


class _PruningSegmentWriter:
    """map_groups callable: apply the per-term keep rule to one
    partition's posting rows, then delegate to the standard
    SegmentWriter (atomic segment + manifest entry)."""

    def __init__(self, out_dir: str, keep_frac: float) -> None:
        from ..stages.encode import SegmentWriter

        self._writer = SegmentWriter(out_dir)
        self.keep_frac = float(keep_frac)
        self.__name__ = "PruningSegmentWriter"

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return self._writer(group)
        terms = group.column("term").to_numpy(zero_copy_only=False)
        tfs = group.column("tf").to_numpy(zero_copy_only=False)
        docs = group.column("doc_id").to_numpy(zero_copy_only=False)
        # order: term asc, tf desc, doc asc -> rank-within-term
        order = np.lexsort((docs, -tfs.astype(np.int64), terms))
        t_sorted = terms[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(t_sorted[1:] != t_sorted[:-1]) + 1))
        counts = np.diff(np.concatenate((starts, [len(t_sorted)])))
        rank = np.arange(len(t_sorted)) - np.repeat(starts, counts)
        keep_n = np.maximum(
            1, np.ceil(self.keep_frac * counts - 1e-9).astype(np.int64))
        keep = rank < np.repeat(keep_n, counts)
        sel = np.sort(order[keep])  # restore input order for the encoder
        return self._writer(group.take(pa.array(sel)))


def prune_index(
    src_dir: str,
    out_dir: str,
    *,
    keep_frac: float = 0.5,
    num_partitions: int | None = None,
) -> dict:
    """Write the pruned index artifact at ``out_dir``; returns its meta
    (original corpus stats, pruned posting counts)."""
    if not (0.0 < keep_frac <= 1.0):
        raise ValueError("keep_frac must be in (0, 1]")
    src_meta = mf.load_meta(src_dir)
    if src_meta.get("positions"):
        raise ValueError("pruning a positional index would break phrase "
                         "semantics; prune the non-positional index")
    P = num_partitions or int(src_meta["num_partitions"])

    from ..functions.hashing import term_partition

    def add_part(batch: pa.Table) -> pa.Table:
        terms = batch.column("term").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(terms, return_inverse=True)
        # the UNSALTED base route on purpose (keep rule needs the whole
        # term co-located); must stay the engine's read-side routing —
        # term_partition is the single source of truth
        base = np.fromiter(
            (term_partition(str(t), P) for t in uniq),
            dtype=np.int32, count=len(uniq),
        )
        return batch.append_column("part", pa.array(base[inv], pa.int32()))

    os.makedirs(out_dir, exist_ok=True)
    manifest_rows = (
        segments_as_postings(src_dir)
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(_PruningSegmentWriter(out_dir, keep_frac),
                    batch_format="pyarrow")
    )
    entries = {int(r["part"]): r for r in manifest_rows.take_all()}

    docs_paths = sorted(_glob.glob(os.path.join(src_dir, "docs", "*.parquet")))
    if docs_paths:
        docs_out = os.path.join(out_dir, "docs")
        marker = os.path.join(out_dir, "_DOCS_SUCCESS")
        if not os.path.exists(marker):
            # a partial docs dir from a crashed run must be cleared:
            # Ray's write_parquet APPENDS (uuid filenames), so a rerun
            # over leftovers would silently duplicate every doc row
            import shutil

            shutil.rmtree(docs_out, ignore_errors=True)
            ray.data.read_parquet(docs_paths).write_parquet(docs_out)
            mf.atomic_write_bytes(marker, b"")

    meta = {
        "format_version": 3,
        "lang_stats": src_meta.get("lang_stats", {}),
        "block_size": schemas.BLOCK_SIZE,
        # corpus stats carried UNCHANGED: tf_weight must match the full
        # index for surviving postings (only idf shifts, via pruned df)
        "n_docs": src_meta["n_docs"],
        "total_len": src_meta["total_len"],
        "n_postings": int(sum(e["n_postings"] for e in entries.values())),
        "avgdl": src_meta["avgdl"],
        "num_partitions": P,
        "parts_built": sorted(entries),
        "parts_skipped_on_resume": [],
        "salt_bits": src_meta.get("salt_bits", 4),
        "hot_terms": [],  # keep rule already co-located every term
        "query_lang": src_meta.get("query_lang", "simple"),
        "id_col": src_meta.get("id_col"),
        "positions": False,
        "pruned_from": os.path.abspath(src_dir),
        "keep_frac": keep_frac,
    }
    mf.write_meta(out_dir, meta)
    mf.mark_complete(out_dir)
    return meta
