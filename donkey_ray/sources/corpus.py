"""Corpus sources / adapters (SURVEY.md B1).

Reads prune columns at the Parquet scan (only the 5 corpus columns leave
storage) and validate the declared schema, failing fast on drift.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.dataset as pads
import ray.data

from .. import schemas

CORPUS_COLUMNS = [f.name for f in schemas.CORPUS]


def read_corpus(
    path: str,
    *,
    langs: list[str] | None = None,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Read a Parquet corpus (repo, path, commit, lang, content).

    Column pruning happens at the read; an optional lang filter is pushed
    into the scan (SURVEY.md B9/B10).
    """
    frag = pads.dataset(path)
    schemas.validate(frag.schema, schemas.CORPUS, f"corpus at {path}")
    extra = [c for c in ("doc_id",) if c in frag.schema.names]
    kwargs = {}
    if langs:
        from pyarrow.dataset import field

        kwargs["filter"] = field("lang").isin(langs)
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    return ray.data.read_parquet(path, columns=CORPUS_COLUMNS + extra, **kwargs)


def documents_as_corpus(
    sf_dir: str, *, content_col: str = "text"
) -> ray.data.Dataset:
    """Adapt the driver's documents table (doc_id, text, lang, source,
    n_chars — TESTDATA.md) into the corpus shape, keeping its doc_id.

    Mapping (FIXTURES.md section 4): repo <- source, path <- str(doc_id),
    commit <- '' (ids come from the doc_id column), content <- text.
    ``content_col`` selects which column becomes the indexed content —
    per-FIELD indexes (e.g. over ``source``) reuse this adapter.
    """
    cols = ["doc_id", "text", "lang", "source"]
    if content_col not in cols:
        cols.append(content_col)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)

    def adapt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "repo": batch.column("source").cast(pa.string()),
                "path": pa.array(
                    [str(v) for v in batch.column("doc_id").to_pylist()], pa.string()
                ),
                "commit": pa.array([""] * n, pa.string()),
                "lang": batch.column("lang").cast(pa.string()),
                "content": batch.column(content_col).cast(pa.string()),
                "doc_id": batch.column("doc_id").cast(pa.int64()),
            }
        )

    return ds.map_batches(adapt, batch_format="pyarrow", zero_copy_batch=True)
