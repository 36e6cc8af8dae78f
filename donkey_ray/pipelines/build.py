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
from ..stages.extract import PostingsExtractor, doc_meta, extract_postings
from ..state import manifest as mf

DEFAULT_PARTITIONS = 16

# Auto partition sizing (num_partitions=None): one partition per this
# many postings (~0.5 GB of encoded segment at ~16 B/posting) — small
# enough that a SegmentWriter group and its shuffle object fit a worker
# heap, large enough that per-partition overheads stay amortized.
TOKENS_PER_PARTITION = 32_000_000
MAX_AUTO_PARTITIONS = 1 << 18  # past this, segments grow instead (a
# shuffle with >262k partitions needs operational changes anyway)


def auto_partition_count(est_total_tokens: int) -> int:
    """Partition count from the hot-pass postings-volume estimate — a
    PURE function of the data (never of cluster size), so N- and
    4N-node builds of the same corpus choose the same partitioning and
    a resume on any cluster continues the same layout. est<=0 (hot
    detection disabled / empty sample) falls back to
    DEFAULT_PARTITIONS."""
    if est_total_tokens <= 0:
        return DEFAULT_PARTITIONS
    import math

    return max(1, min(MAX_AUTO_PARTITIONS,
                      math.ceil(est_total_tokens / TOKENS_PER_PARTITION)))


def _docs_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "docs")


def _count_docs(out_dir: str) -> int:
    return pads.dataset(_docs_dir(out_dir)).count_rows()


def compute_lang_stats(out_dir: str) -> dict:
    """Per-lang collection stats (SURVEY §1.2 ``stats`` "+ per-lang"):
    {lang: {n_docs, total_len, avgdl}} aggregated from the docs
    artifact's (lang, doc_len) columns — a 2-column scan with in-batch
    partial aggregation, then one keyed exchange over n_langs keys
    (lang cardinality is tiny, so the exchange is a few rows). Returns
    {} when the docs artifact predates the doc_len column (old-format
    resume) — detected by a SCHEMA probe, not a blanket except: a
    transient cluster failure during the stats scan must propagate, or
    a successful build would permanently bake lang_stats={} into its
    meta with no way to tell that apart from a pre-v3 artifact."""
    from ..stages.exchange import partitioned_aggregate

    try:
        schema = pads.dataset(_docs_dir(out_dir)).schema
    except (FileNotFoundError, OSError):
        return {}
    if "lang" not in schema.names or "doc_len" not in schema.names:
        return {}
    docs = ray.data.read_parquet(
        _docs_dir(out_dir), columns=["lang", "doc_len"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["lang"], use_threads=False).aggregate(
            [("doc_len", "sum"), ("doc_len", "count")])
        return g.rename_columns(["lang", "s", "c"])

    rows = partitioned_aggregate(
        docs.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["lang"], [("s", "sum"), ("c", "sum")],
        rename={"s_sum": "s", "c_sum": "c"},
    ).take_all()  # n_langs rows
    return {
        str(r["lang"]): {
            "n_docs": int(r["c"]),
            "total_len": int(r["s"]),
            "avgdl": (r["s"] / r["c"]) if r["c"] else 0.0,
        }
        for r in sorted(rows, key=lambda r: str(r["lang"]))
    }


def detect_hot_terms(
    ds: ray.data.Dataset,
    *,
    id_col: str | None,
    sample_mod: int,
    hot_df_ratio: float,
    lang_override: str | None = None,
) -> tuple[list[str], int, int]:
    """Deterministic ~1/sample_mod sample -> per-term df -> terms whose
    sampled df exceeds hot_df_ratio of the sample size (SURVEY.md B18).
    Returns (hot_terms, n_sample_docs, n_sample_tokens) — the token
    total feeds auto partition sizing (``num_partitions=None``).

    Fully data-deterministic (hash-of-doc_id sampling), so every cluster
    size / retry sees the same hot set — a prerequisite for deterministic
    partition routing."""
    extractor = PostingsExtractor(1, id_col=id_col, emit_part=False,
                                  lang_override=lang_override)

    def sample_partial_df(batch: pa.Table) -> pa.Table:
        """Per-batch partial df over the deterministic sample, pre-filtered
        to candidate-hot terms so only a tiny table reaches the driver.

        A term qualifies in a batch if it appears in >= hot_df_ratio of the
        batch's sampled docs (and >= 2 of them). Genuinely hot terms appear
        at ~their global rate in every batch, so they always qualify; the
        filter only prunes the cold tail. The hot set is a routing
        heuristic — correctness never depends on it (runs are merged at
        query time)."""
        from ..stages.extract import _doc_ids_for_batch

        empty = pa.table({"term": pa.array([], pa.string()),
                          "df_part": pa.array([], pa.int64())})
        ids = _doc_ids_for_batch(batch, id_col)
        mask = deterministic_sample_mask(ids, sample_mod)
        n_sampled = int(mask.sum())
        if n_sampled == 0:
            return empty
        out = extractor(batch.filter(pa.array(mask)))
        counts = (
            out.select(["term"])
            .group_by(["term"], use_threads=False)
            .aggregate([("term", "count")])
        )
        import pyarrow.compute as pc

        # sparse batches (tiny corpora / many blocks) would never reach a
        # cutoff of 2 in any single batch; fall back to 1 there and let the
        # driver-side total threshold do the filtering
        floor = 2 if n_sampled >= 8 else 1
        cutoff = max(floor, int(np.ceil(hot_df_ratio * n_sampled)))
        cand = pa.table(
            {
                "term": counts.column("term"),
                "df_part": counts.column("term_count").cast(pa.int64()),
            }
        ).filter(pc.greater_equal(counts.column("term_count"), cutoff))
        # sentinel rows carry this batch's sample size + token total
        # (sum of tf over sampled postings) to the driver
        n_tokens = int(pc.sum(out.column("tf")).as_py() or 0)
        return pa.concat_tables([
            cand,
            pa.table({"term": pa.array(["\x00__sampled__",
                                        "\x00__tokens__"], pa.string()),
                      "df_part": pa.array([n_sampled, n_tokens],
                                          pa.int64())}),
        ])

    partials = ds.map_batches(
        sample_partial_df, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # candidate-hot only: tiny
    totals: dict[str, int] = {}
    for r in partials:
        totals[r["term"]] = totals.get(r["term"], 0) + int(r["df_part"])
    n_sample_tokens = totals.pop("\x00__tokens__", 0)
    n_sample_docs = max(totals.pop("\x00__sampled__", 0), 1)
    thresh = max(2.0, hot_df_ratio * n_sample_docs)
    hot = sorted(t for t, c in totals.items() if c >= thresh)
    return hot, n_sample_docs, n_sample_tokens


def _docs_pass_fragments(corpus_path: str, out_dir: str,
                         id_col: str | None,
                         analyzer: str | None = None) -> None:
    """Fragment-parallel, fragment-RESUMABLE docs pass: the work list is
    the corpus's parquet fragments; each task reads one fragment, derives
    DOCS rows, and atomically writes ``docs/frag-<sha16>.parquet``. On
    re-run, fragments whose output exists are skipped before any task is
    launched. Runs as a Dataset over the fragment list (streaming,
    retry-safe: names are deterministic, writes atomic)."""
    import hashlib
    import tempfile

    import pyarrow.parquet as pq

    frag_paths = sorted(pads.dataset(corpus_path).files)
    docs_dir = _docs_dir(out_dir)
    os.makedirs(docs_dir, exist_ok=True)

    def out_name(frag: str) -> str:
        return os.path.join(
            docs_dir, f"frag-{hashlib.sha256(frag.encode()).hexdigest()[:16]}.parquet"
        )

    todo = [p for p in frag_paths if not os.path.exists(out_name(p))]
    if not todo:
        return

    def process(batch: pa.Table) -> pa.Table:
        done = []
        for frag in batch.column("path").to_pylist():
            if os.path.exists(out_name(frag)):
                done.append(frag)  # a retried task re-sees finished work
                continue
            tbl = pq.read_table(frag)
            docs = doc_meta(tbl, id_col=id_col, analyzer=analyzer)
            target = out_name(frag)
            fd, tmp = tempfile.mkstemp(dir=docs_dir, prefix=".tmp-docs-")
            os.close(fd)
            try:
                pq.write_table(docs, tmp, compression="zstd")
                os.replace(tmp, target)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
            done.append(frag)
        return pa.table({"path": pa.array(done, pa.string())})

    # MANY blocks, not one: from_arrow(one_table) is a single block and
    # map tasks are per-block, so the whole docs pass used to run
    # inside ONE task (measured: serial 5-6 s at bench scale; the
    # round-4 doc_len column made that serial path the build's
    # critical path). One block per fragment up to 8x cluster CPUs;
    # past that, blocks hold several fragments each (still parallel,
    # bounded task count at 10^6-fragment corpora — a retried task
    # skips its already-written fragments via the marker files).
    cpus = int(ray.cluster_resources().get("CPU", 4))
    (
        ray.data.from_items([{"path": p} for p in todo],
                            override_num_blocks=min(len(todo), 8 * cpus))
        .map_batches(process, batch_format="pyarrow", batch_size=1)
        .materialize()
    )


def build_index(
    corpus: str | ray.data.Dataset,
    out_dir: str,
    *,
    num_partitions: int | None = DEFAULT_PARTITIONS,
    id_col: str | None = None,
    salt_bits: int = 4,
    sample_mod: int = 64,
    hot_df_ratio: float = 0.25,
    detect_hot: bool = True,
    batch_size: int = 512,
    concurrency=None,
    verify_resume_checksum: bool = True,
    query_lang: str | None = None,
    override_num_blocks: int | None = None,
    combine: bool = False,
    positions: bool = False,
    analyzer_lang: str | None = None,
) -> dict:
    """Build (or resume) an inverted index at ``out_dir``. Returns meta.

    ``num_partitions=None`` self-sizes from the hot-pass token-volume
    estimate (``auto_partition_count``): a 100 TB corpus picks
    thousands of partitions, a test corpus picks one — no fixed default
    to outgrow. The choice is persisted with the hot set, so resumes
    (on any cluster size) keep the original layout.

    Block sizing: per-task and per-shuffle-object overheads grow with block
    COUNT, so blocks are kept at ~2x cluster CPUs (larger data -> bigger
    blocks, not more of them) unless overridden."""
    t_start = time.monotonic()
    if isinstance(corpus, str):
        if override_num_blocks is None:
            cpus = int(ray.cluster_resources().get("CPU", 4))
            override_num_blocks = max(2 * cpus, 8)
        ds = read_corpus(corpus, override_num_blocks=override_num_blocks)
        if id_col is None and "doc_id" in ds.schema().names:
            id_col = "doc_id"
    else:
        ds = corpus

    if mf.is_complete(out_dir):
        return mf.load_meta(out_dir)

    os.makedirs(out_dir, exist_ok=True)

    # ---- docs pass (sha256 invariant) + hot-term detection, CONCURRENT:
    # two independent dataset executions share the cluster; the docs pass
    # alone does not saturate it, so overlapping hides the sample pass ----
    docs_done = os.path.join(out_dir, "_DOCS_SUCCESS")
    hot_file = os.path.join(out_dir, "hot_terms.json")

    def _run_docs_pass() -> None:
        if os.path.exists(docs_done):
            return
        if isinstance(corpus, str):
            # fragment-resumable path: one deterministic output file per
            # input fragment, finished fragments skipped on re-run — a
            # crashed 100 TB docs pass loses only in-flight fragments,
            # and NO shuffle is added (each fragment maps independently)
            _docs_pass_fragments(corpus, out_dir, id_col,
                                 analyzer=analyzer_lang)
        else:
            # in-memory corpus (tests / deltas): all-or-nothing is fine —
            # a crashed pass leaves partial files without the marker;
            # start clean so rerun can't duplicate rows
            if os.path.exists(_docs_dir(out_dir)):
                import shutil

                shutil.rmtree(_docs_dir(out_dir))
            docs = ds.map_batches(
                functools.partial(doc_meta, id_col=id_col,
                                  analyzer=analyzer_lang),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            docs.write_parquet(_docs_dir(out_dir))
        mf.atomic_write_bytes(docs_done, b"")

    def _hot_sample_source():
        """Dataset + row-mod for the hot-term sample pass. For a path
        corpus with many fragments, sample at the FILE level first
        (sorted list, every j-th file — deterministic for the same
        input, so every cluster size/retry still sees one hot set) and
        reduce the row mod to keep the overall ~1/sample_mod rate:
        the detect pass then READS 1/j of the bytes instead of scanning
        every file to discard 63/64 of its rows. The hot set is a
        routing heuristic — correctness never depends on it — so the
        slight sample-composition change is free."""
        if not isinstance(corpus, str):
            return ds, sample_mod, sample_mod
        files = sorted(pads.dataset(corpus).files)
        file_mod = min(8, sample_mod)
        if len(files) < 2 * file_mod:
            return ds, sample_mod, sample_mod
        subset = files[::file_mod]
        cols = ["lang", "content"]
        cols += ([id_col] if id_col else ["repo", "path", "commit"])
        cpus = int(ray.cluster_resources().get("CPU", 4))
        sample_ds = ray.data.read_parquet(
            subset, columns=cols,
            override_num_blocks=max(8, min(len(subset), cpus)),
        )
        row_mod = max(1, sample_mod // file_mod)
        return sample_ds, row_mod, file_mod * row_mod

    def _run_hot_pass() -> tuple[list[str], int]:
        """Returns (hot_terms, estimated total corpus tokens). Both are
        persisted in hot_terms.json, so a RESUMED build reuses the
        recorded values — the auto partition count can never drift
        between the original run and its resume."""
        if os.path.exists(hot_file):
            import json

            with open(hot_file) as f:
                rec = json.load(f)
            return rec["hot_terms"], int(rec.get("est_total_tokens", 0))
        if detect_hot:
            sample_ds, row_mod, eff_mod = _hot_sample_source()
            hot_terms, n_sample, n_tokens = detect_hot_terms(
                sample_ds, id_col=id_col, sample_mod=row_mod,
                hot_df_ratio=hot_df_ratio, lang_override=analyzer_lang,
            )
            est_tokens = n_tokens * eff_mod
        else:
            hot_terms, n_sample, n_tokens, est_tokens = [], 0, 0, 0
        mf.atomic_write_json(
            hot_file,
            {"hot_terms": hot_terms, "n_sample_docs": n_sample,
             "n_sample_tokens": n_tokens, "est_total_tokens": est_tokens,
             "sample_mod": sample_mod, "hot_df_ratio": hot_df_ratio},
        )
        return hot_terms, est_tokens

    # The docs pass (sha256 invariant + docs parquet) is independent of
    # the whole postings pipeline — only the tiny hot-term sample gates
    # postings extraction. Overlap the docs pass with BOTH (two Ray Data
    # executions share the cluster with backpressure), which hides its
    # full wall time: with the vectorized tokenizer the docs pass was
    # ~30% of build wall when run serially.
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=1)
    docs_future = pool.submit(_run_docs_pass)
    try:
        hot_terms, est_tokens = _run_hot_pass()
        if num_partitions is None:
            num_partitions = auto_partition_count(est_tokens)

        # ---- postings pass + partition shuffle + segment encode ----
        done = mf.validated_done_parts(
            out_dir, num_partitions, verify_checksum=verify_resume_checksum
        )
        skipped = sorted(done)
        if len(done) < num_partitions:
            hot_ref = ray.put(hot_terms) if hot_terms else None
            # task pool (not actors): extract_postings caches the
            # configured extractor per worker process, giving actor-like
            # state amortization without actor-pool startup latency
            extract_kwargs = dict(
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=batch_size,
            )
            if concurrency is not None:
                extract_kwargs["concurrency"] = concurrency
            postings = ds.map_batches(
                functools.partial(
                    extract_postings,
                    num_partitions=num_partitions,
                    hot_ref=hot_ref,
                    salt_bits=salt_bits,
                    id_col=id_col,
                    combine=combine,
                    positions=positions,
                    lang_override=analyzer_lang,
                ),
                **extract_kwargs,
            )
            if done:
                done_arr = np.array(sorted(done), dtype=np.int32)

                def drop_done(batch: pa.Table) -> pa.Table:
                    keep = ~np.isin(
                        batch.column("part").to_numpy(zero_copy_only=False),
                        done_arr,
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
        docs_future.result()
    finally:
        pool.shutdown(wait=True)
    n_docs = _count_docs(out_dir)

    # ---- stats + meta ----
    all_entries = {**{p: e for p, e in done.items()}, **new_entries}
    total_len = int(sum(e["sum_tf"] for e in all_entries.values()))
    n_postings = int(sum(e["n_postings"] for e in all_entries.values()))
    from .. import schemas

    meta = {
        "format_version": 3,
        "block_size": schemas.BLOCK_SIZE,
        "n_docs": int(n_docs),
        "total_len": total_len,
        "n_postings": n_postings,
        "avgdl": (total_len / n_docs) if n_docs else 0.0,
        "lang_stats": compute_lang_stats(out_dir),
        "num_partitions": num_partitions,
        "parts_built": sorted(int(p) for p in all_entries),
        "parts_skipped_on_resume": skipped,
        "salt_bits": salt_bits,
        "hot_terms": hot_terms,
        "query_lang": query_lang or "simple",
        "analyzer_lang": analyzer_lang,
        "id_col": id_col,
        "positions": bool(positions),
        "build_wall_s": round(time.monotonic() - t_start, 3),
    }
    mf.write_meta(out_dir, meta)
    mf.mark_complete(out_dir)
    return meta
