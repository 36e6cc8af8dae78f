"""Training-data export sink: quality gate -> PII scrub -> partitioned
parquet -> read-back.

The canonical "clean corpus" pipeline a training run consumes: rows
stream through the quality filter and the vectorized PII redaction, and
land in a partitioned parquet directory (one file per block — Ray's
write path — so a re-export can be parallel-read at any block size and
a partially-written export is detected by the marker, never read).
Nothing materializes on the driver; the returned Dataset re-reads the
artifact (proving the sink round-trips).
"""

from __future__ import annotations

import os

import ray.data

from .analyze import quality_filter, redact_pii


def export_clean_corpus(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    max_stopword_ratio: float = 0.5,
) -> ray.data.Dataset:
    """Filter -> redact -> write -> read back. A complete (marker-ed)
    export at ``out_dir`` is served as-is; a partial one is rebuilt."""
    marker = os.path.join(out_dir, "_EXPORT_SUCCESS")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
        cleaned = redact_pii(
            quality_filter(
                ds,
                text_col=text_col,
                id_col=id_col,
                min_tokens=min_tokens,
                max_stopword_ratio=max_stopword_ratio,
            ),
            text_col=text_col,
            id_col=id_col,
        )
        cleaned.write_parquet(out_dir)
        from ..state import manifest as mf

        mf.atomic_write_bytes(marker, b"ok")
    return ray.data.read_parquet(
        out_dir, file_extensions=["parquet"]
    )
