"""Index build pipeline (SURVEY.md section 3.2.1).

read_parquet -> map_batches(PostingsExtractor actor pool) ->
groupby('part').map_groups(SegmentWriter) -> manifest + stats, with:
  - a docs pass carrying the per-row sha256(content) invariant,
  - deterministic-sample hot-term (df) detection + salted routing (B18),
  - per-partition lineage manifest; resume skips validated partitions (B5).

Everything streams: no materialize() of the exploded postings; the only
all-to-all exchange is the single groupby('part') shuffle whose key is the
(salted) term-hash partition.

Donkey analogue [PK]: batch insert + index build + 'sync' checkpoint
(src/donkey.cpp / src/index-kgraph.cpp — file-level, SURVEY.md section 0).
"""

from __future__ import annotations

import functools
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import ray
import ray.data

from ..functions.hashing import deterministic_sample_mask
from ..sources.corpus import read_corpus
from ..stages.encode import SegmentWriter
from ..stages.extract import PostingsExtractor, doc_meta
from ..state import manifest as mf

DEFAULT_PARTITIONS = 16


def _docs_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "docs")


def _count_docs(out_dir: str) -> int:
    return pads.dataset(_docs_dir(out_dir)).count_rows()


def detect_hot_terms(
    ds: ray.data.Dataset,
    *,
    id_col: str | None,
    sample_mod: int,
    hot_df_ratio: float,
    n_docs: int,
) -> tuple[list[str], int]:
    """Deterministic ~1/sample_mod sample -> per-term df -> terms whose
    sampled df exceeds hot_df_ratio of the sample size (SURVEY.md B18).

    Fully data-deterministic (hash-of-doc_id sampling), so every cluster
    size / retry sees the same hot set — a prerequisite for deterministic
    partition routing."""
    extractor = PostingsExtractor(1, id_col=id_col, emit_part=False)

    def sample_postings(batch: pa.Table) -> pa.Table:
        from ..stages.extract import _doc_ids_for_batch

        ids = _doc_ids_for_batch(batch, id_col)
        mask = deterministic_sample_mask(ids, sample_mod)
        if not mask.any():
            return pa.table({"term": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64())})
        sub = batch.filter(pa.array(mask))
        out = extractor(sub)
        return out.select(["term", "doc_id"])

    sampled = ds.map_batches(sample_postings, batch_format="pyarrow", zero_copy_batch=True)
    counts = sampled.groupby("term").count()
    # expected sample size is deterministic given the data; avoids a second
    # pass over the sample
    n_sample_docs = max(n_docs // sample_mod, 1)
    thresh = max(2.0, hot_df_ratio * n_sample_docs)

    def only_hot(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater_equal(batch.column("count()"), int(thresh)))

    rows = counts.map_batches(
        only_hot, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # hot set is tiny by construction
    hot = sorted(r["term"] for r in rows)
    return hot, n_sample_docs


def build_index(
    corpus: str | ray.data.Dataset,
    out_dir: str,
    *,
    num_partitions: int = DEFAULT_PARTITIONS,
    id_col: str | None = None,
    salt_bits: int = 4,
    sample_mod: int = 64,
    hot_df_ratio: float = 0.25,
    detect_hot: bool = True,
    batch_size: int = 256,
    concurrency=None,
    verify_resume_checksum: bool = True,
    query_lang: str | None = None,
) -> dict:
    """Build (or resume) an inverted index at ``out_dir``. Returns meta."""
    t_start = time.monotonic()
    if isinstance(corpus, str):
        ds = read_corpus(corpus)
        if id_col is None and "doc_id" in ds.schema().names:
            id_col = "doc_id"
    else:
        ds = corpus

    if mf.is_complete(out_dir):
        return mf.load_meta(out_dir)

    os.makedirs(out_dir, exist_ok=True)

    # ---- docs pass (per-row sha256 invariant; no tokenization) ----
    docs_done = os.path.join(out_dir, "_DOCS_SUCCESS")
    if not os.path.exists(docs_done):
        # a crashed docs pass leaves partial files without the marker;
        # start clean so rerun can't duplicate rows
        if os.path.exists(_docs_dir(out_dir)):
            import shutil

            shutil.rmtree(_docs_dir(out_dir))
        docs = ds.map_batches(
            functools.partial(doc_meta, id_col=id_col),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        docs.write_parquet(_docs_dir(out_dir))
        mf.atomic_write_bytes(docs_done, b"")
    n_docs = _count_docs(out_dir)

    # ---- hot-term detection (deterministic sample) ----
    hot_file = os.path.join(out_dir, "hot_terms.json")
    if os.path.exists(hot_file):
        import json

        with open(hot_file) as f:
            hot_info = json.load(f)
        hot_terms = hot_info["hot_terms"]
    else:
        if detect_hot and n_docs >= sample_mod:
            hot_terms, n_sample = detect_hot_terms(
                ds, id_col=id_col, sample_mod=sample_mod,
                hot_df_ratio=hot_df_ratio, n_docs=n_docs,
            )
        else:
            hot_terms, n_sample = [], 0
        mf.atomic_write_json(
            hot_file,
            {"hot_terms": hot_terms, "n_sample_docs": n_sample,
             "sample_mod": sample_mod, "hot_df_ratio": hot_df_ratio},
        )

    # ---- postings pass + partition shuffle + segment encode ----
    done = mf.validated_done_parts(
        out_dir, num_partitions, verify_checksum=verify_resume_checksum
    )
    skipped = sorted(done)
    if len(done) < num_partitions:
        hot_ref = ray.put(hot_terms) if hot_terms else None
        if concurrency is None:
            # actor pool sized to the cluster; autoscales down when idle
            cpus = int(ray.cluster_resources().get("CPU", 4))
            concurrency = (1, max(2, cpus))
        extract_kwargs = dict(
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            concurrency=concurrency,
        )
        postings = ds.map_batches(
            PostingsExtractor,
            fn_constructor_kwargs=dict(
                num_partitions=num_partitions,
                hot_terms=hot_ref,
                salt_bits=salt_bits,
                id_col=id_col,
            ),
            **extract_kwargs,
        )
        if done:
            done_arr = np.array(sorted(done), dtype=np.int32)

            def drop_done(batch: pa.Table) -> pa.Table:
                keep = ~np.isin(
                    batch.column("part").to_numpy(zero_copy_only=False), done_arr
                )
                return batch.filter(pa.array(keep))

            postings = postings.map_batches(
                drop_done, batch_format="pyarrow", zero_copy_batch=True
            )
        manifest_rows = postings.groupby("part").map_groups(
            SegmentWriter(out_dir), batch_format="pyarrow"
        )
        new_entries = {int(r["part"]): r for r in manifest_rows.take_all()}
    else:
        new_entries = {}

    # ---- stats + meta ----
    all_entries = {**{p: e for p, e in done.items()}, **new_entries}
    total_len = int(sum(e["sum_tf"] for e in all_entries.values()))
    n_postings = int(sum(e["n_postings"] for e in all_entries.values()))
    meta = {
        "format_version": 1,
        "n_docs": int(n_docs),
        "total_len": total_len,
        "n_postings": n_postings,
        "avgdl": (total_len / n_docs) if n_docs else 0.0,
        "num_partitions": num_partitions,
        "parts_built": sorted(int(p) for p in all_entries),
        "parts_skipped_on_resume": skipped,
        "salt_bits": salt_bits,
        "hot_terms": hot_terms,
        "query_lang": query_lang or "simple",
        "id_col": id_col,
        "build_wall_s": round(time.monotonic() - t_start, 3),
    }
    mf.write_meta(out_dir, meta)
    mf.mark_complete(out_dir)
    return meta
