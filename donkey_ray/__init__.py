"""donkey_ray — a Ray-Data-native inverted-index build + BM25 query engine.

A from-scratch engine (NOT a port) with the capability shape of the
aaalgo/donkey content-based search-engine generator (extract -> durable
store -> index build -> top-k query -> rerank, with checkpoint/resume),
re-grounded per BASELINE.json's north rule as a fulltext BM25 engine over
a Parquet corpus of source code (repo, path, commit, lang, content).

See SURVEY.md for the blueprint. The reference checkout at /root/reference
was empty at survey time (SURVEY.md section 0); donkey parallels cited in
docstrings are file-level public knowledge, tagged [PK].

Layout:
  functions/  pure kernels: varbyte codec, tokenizers, BM25 math, hashing,
              text statistics, minhash/simhash, HLL sketch
  sources/    corpus readers / adapters (Parquet in, schema validation)
  stages/     Ray Data stage callables (actor classes for map_batches /
              map_groups): postings extraction, segment encode, query
              scoring (sharded lazy dictionary), keyed exchange/cogroup
  pipelines/  end-to-end pipelines: build, query (actor-pool +
              scatter-gather + rerank), dedup, components (clusters +
              canonical), ann, ivf, fuzzy (trigram edit-distance),
              analyze, introspect (index stats, suggest), export,
              joins (hash + as-of), windows, distinct, incremental,
              kmeans (pinned-int Lloyd's), sif (SIF doc embeddings),
              dsir (importance-weight data selection)
  state/      manifest / lineage / stats (checkpoint + resume)
  serve.py    named-actor index server (ping/search/insert/flush/compact)
  synth.py    deterministic synthetic corpus generator (FIXTURES.md)
  oracle.py   brute-force pinned-spec BM25 oracle (SURVEY.md section 5)
"""

__version__ = "0.1.0"
