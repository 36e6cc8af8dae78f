"""CLI entry points (donkey analogue [PK]: console tools / server main,
src/console.cpp + src/server.cpp — file-level, SURVEY.md section 0).

Usage (ray job submit compatible — each command owns its Ray session):
  python -m donkey_ray.cli build  --input corpus.parquet --output idxdir
                                  [--partitions P] [--query-lang code]
  python -m donkey_ray.cli query  --index idxdir --queries q.parquet
                                  [--k 10] [--output results.parquet]
                                  [--text "free form query"] [--hydrate]
  python -m donkey_ray.cli stats  --index idxdir
  python -m donkey_ray.cli synth  --rows N --output corpus.parquet
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)


def cmd_build(args) -> int:
    _ray_init()
    from .pipelines.build import build_index

    meta = build_index(
        args.input,
        args.output,
        num_partitions=args.partitions,
        query_lang=args.query_lang,
        salt_bits=args.salt_bits,
        detect_hot=not args.no_hot_detection,
        positions=args.positions,
    )
    print(json.dumps(meta, indent=1))
    return 0


def cmd_query(args) -> int:
    _ray_init()
    import pyarrow as pa

    from .pipelines.query import hydrate_results, score_queries
    from .stages.score import QueryEngine
    from .util import dataset_to_table

    if args.text is not None:
        engine = QueryEngine(args.index, mode=args.mode)
        if args.kind == "phrase":
            hits = engine.phrase_topk(args.text, args.k)
        elif args.kind == "near":
            hits = engine.near_topk(args.text, args.k, window=args.window)
        elif args.kind == "and":
            hits = engine.and_topk(args.text, args.k)
        elif args.kind == "not":
            hits = engine.not_topk(args.text, args.neg_text or "", args.k)
        elif args.kind == "prefix":
            hits = engine.prefix_topk(args.text, args.k)
        elif args.kind == "fuzzy":
            from .pipelines.fuzzy import fuzzy_topk

            hits = fuzzy_topk(args.index, args.text, args.k)
        elif args.kind == "msm":
            hits = engine.msm_topk(args.text, args.k, args.min_match)
        elif args.boosts:
            hits = engine.boosted_topk(args.text, args.k,
                                       json.loads(args.boosts))
        else:
            hits = engine.topk(args.text, args.k)
        res = pa.table(
            {
                "query_id": pa.array([0] * len(hits), pa.int64()),
                "rank": pa.array(range(1, len(hits) + 1), pa.int32()),
                "doc_id": pa.array([d for d, _ in hits], pa.int64()),
                "score": pa.array([s for _, s in hits], pa.float64()),
            }
        )
    else:
        if not args.queries:
            print("error: provide --text or --queries", file=sys.stderr)
            return 2
        import ray.data

        queries = ray.data.read_parquet(args.queries)
        res = dataset_to_table(
            score_queries(args.index, queries, mode=args.mode,
                          kind=args.kind, window=args.window)
        )
    if args.hydrate:
        res = hydrate_results(res, args.index)
    if args.output:
        import pyarrow.parquet as pq

        pq.write_table(res, args.output)
        print(f"wrote {res.num_rows} rows to {args.output}")
    else:
        for row in res.to_pylist():
            print(json.dumps(row))
    return 0


def cmd_stats(args) -> int:
    from .state import manifest as mf

    meta = mf.load_meta(args.index)
    done = mf.validated_done_parts(
        args.index, meta["num_partitions"], verify_checksum=False
    )
    meta["partitions_on_disk"] = len(done)
    print(json.dumps(meta, indent=1))
    return 0


def cmd_verify(args) -> int:
    """Integrity-check an index on disk: every partition's segment must
    exist and hash to its manifest sha256, the docs table and _SUCCESS
    marker must be present, and meta stats must be internally
    consistent. Exit 0 = sound; 1 = problems (listed on stdout) — the
    offline half of donkey's sync/checkpoint surface (SURVEY.md A8)."""
    import os

    from .state import manifest as mf

    idx = args.index
    problems: list[str] = []
    try:
        meta = mf.load_meta(idx)
    except (OSError, ValueError) as exc:
        print(f"FAIL: unreadable index meta: {exc}")
        return 1
    if not mf.is_complete(idx):
        problems.append("missing _SUCCESS marker (incomplete build)")
    npart = int(meta["num_partitions"])
    done = mf.validated_done_parts(idx, npart, verify_checksum=True)
    missing = sorted(set(meta.get("parts_built", range(npart))) - set(done))
    for part in missing:
        seg = mf.segment_path(idx, part)
        why = "missing" if not os.path.exists(seg) else "checksum mismatch"
        problems.append(f"partition {part}: segment {why}")
    if not os.path.isdir(os.path.join(idx, "docs")):
        problems.append("missing docs table")
    n_postings = sum(int(e.get("n_postings", 0)) for e in done.values())
    if not missing and n_postings != int(meta.get("n_postings", -1)):
        problems.append(
            f"meta n_postings {meta.get('n_postings')} != "
            f"manifest sum {n_postings}")
    if problems:
        for pr in problems:
            print(f"FAIL: {pr}")
        return 1
    print(json.dumps({
        "ok": True, "partitions": len(done),
        "n_docs": meta.get("n_docs"), "n_postings": n_postings,
        "format_version": meta.get("format_version"),
    }))
    return 0


def cmd_compact(args) -> int:
    """Merge one or more indexes (a base + its deltas, or any set of
    compatible segments) into one fresh index — donkey 'misc reindex'."""
    _ray_init()
    from .pipelines.incremental import merge_indexes

    meta = merge_indexes(
        list(args.indexes), args.output, num_partitions=args.partitions
    )
    print(json.dumps({
        "output": args.output,
        "n_docs": meta["n_docs"],
        "n_postings": meta["n_postings"],
        "num_partitions": meta["num_partitions"],
    }))
    return 0


def cmd_report(args) -> int:
    """One-row corpus report card over a documents-shaped parquet table
    (doc_id, text, lang)."""
    _ray_init()
    import ray.data

    from .pipelines.analyze import corpus_report

    ds = ray.data.read_parquet(
        args.corpus, columns=[args.id_col, args.text_col, args.lang_col]
    )
    tbl = corpus_report(ds, text_col=args.text_col, id_col=args.id_col,
                        lang_col=args.lang_col)
    print(json.dumps(tbl.to_pylist()[0]))
    return 0


def cmd_serve(args) -> int:
    """Start the named serving actor and answer queries from stdin
    (one query text per line; JSON hits per line). The actor outlives
    this process when --detached is given (donkey server analogue).
    --replicas N > 1 fronts N read replicas with a ServeRouter
    (round-robin + failover) under the same name."""
    _ray_init()
    import ray

    from .serve import start_router, start_server

    if args.replicas > 1:
        server = start_router(
            args.index, n_replicas=args.replicas, name=args.name,
            mode=args.mode, detached=args.detached,
        )
    else:
        server = start_server(
            args.index, name=args.name, mode=args.mode,
            detached=args.detached,
        )
    print(json.dumps(ray.get(server.ping.remote())))
    if args.http is not None:
        # donkey A7 network surface: block serving JSON-over-HTTP.
        # Reads go through the router (replicas > 1) or the single
        # actor; writes need the single-actor shape (a router fronts
        # READ replicas only).
        from .httpserve import make_http_frontend

        srv = make_http_frontend(
            router=server if args.replicas > 1 else None,
            primary=None if args.replicas > 1 else server,
            host="0.0.0.0", port=args.http, verbose=True,
        )
        print(json.dumps({"http_port": srv.server_address[1]}))
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass
        return 0
    if args.ping_only:
        return 0
    for line in sys.stdin:
        text = line.strip()
        if not text:
            continue
        print(json.dumps(ray.get(server.search.remote(
            text, args.k, kind=args.kind, window=args.window
        ))))
    return 0


def cmd_ingest_delta(args) -> int:
    """One shard through the full delta-ingest composition (the donkey
    insert→sync lifecycle at batch granularity): probe the chain's
    persisted near-dup artifacts, drop dups, index + artifact the
    survivors, extend the chain. Idempotent/resumable per shard."""
    _ray_init()
    import hashlib

    from .pipelines.ingest import ingest_delta

    sid = args.shard_id or hashlib.sha256(
        args.shard.encode()).hexdigest()[:16]
    overrides = {}
    if args.query_lang is not None:
        overrides["query_lang"] = args.query_lang
    if getattr(args, "auto_compact_shards", None) is not None:
        overrides["auto_compact_shards"] = args.auto_compact_shards
    spec = None
    if overrides:
        from .pipelines.ingest import DEFAULT_SPEC

        spec = {**DEFAULT_SPEC, **overrides}
    meta = ingest_delta(args.state, args.shard, shard_id=sid,
                        text_col=args.text_col, spec=spec)
    print(json.dumps(meta))
    return 0


def cmd_ingest_compact(args) -> int:
    """Fold the chain into one canonical shard (probing cost per new
    shard is O(chain length) — compact when the chain gets long)."""
    _ray_init()
    from .pipelines.ingest import compact_chain

    print(json.dumps(compact_chain(args.state)))
    return 0


def cmd_reshard(args) -> int:
    """Compact-and-reshard a (quiesced, flushed) sharded-writer
    deployment into a new shard count; prints the new shard dirs."""
    _ray_init()
    from .serve import reshard

    out = reshard(args.shards.split(","), args.new_k, args.out,
                  num_partitions=args.partitions)
    print(json.dumps({"shard_dirs": out, "n_shards": len(out)}))
    return 0


def cmd_ingest_search(args) -> int:
    """Query the ingest chain: federated exact BM25 over every shard's
    index segment."""
    _ray_init()
    from .pipelines.ingest import chain_engine

    eng = chain_engine(args.state)
    print(json.dumps({"n_docs": eng.n_docs,
                      "n_indexes": len(eng.index_dirs)}))
    for line in sys.stdin:
        text = line.strip()
        if not text:
            continue
        hits = eng.topk(text, args.k)
        print(json.dumps([
            {"rank": r, "doc_id": d, "score": s}
            for r, (d, s) in enumerate(hits, start=1)]))
    return 0


def cmd_vserve(args) -> int:
    """Start the named VECTOR serving actor (donkey's insert/search
    core) and answer queries from stdin (one JSON float-list per line;
    JSON hits per line)."""
    _ray_init()
    import ray

    from .serve import start_vector_router, start_vector_server

    if args.replicas > 1:
        server = start_vector_router(
            args.index, n_replicas=args.replicas, name=args.name,
            detached=args.detached,
        )
    else:
        server = start_vector_server(
            args.index, name=args.name, detached=args.detached
        )
    print(json.dumps(ray.get(server.ping.remote())))
    if args.http is not None:
        from .httpserve import make_http_frontend

        srv = make_http_frontend(
            vrouter=server if args.replicas > 1 else None,
            vprimary=None if args.replicas > 1 else server,
            host="0.0.0.0", port=args.http, verbose=True,
        )
        print(json.dumps({"http_port": srv.server_address[1]}))
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass
        return 0
    if args.ping_only:
        return 0
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        qv = json.loads(line)
        print(json.dumps(ray.get(server.search.remote(
            qv, args.k, nprobe=args.nprobe
        ))))
    return 0


def cmd_synth(args) -> int:
    _ray_init()
    from .synth import generate_corpus_parquet

    generate_corpus_parquet(args.rows, args.output, seed=args.seed)
    print(f"wrote {args.rows} synthetic corpus rows to {args.output}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="donkey_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an inverted index from a parquet corpus")
    b.add_argument("--input", required=True)
    b.add_argument("--output", required=True)
    b.add_argument("--partitions", type=int, default=16)
    b.add_argument("--query-lang", default="code")
    b.add_argument("--salt-bits", type=int, default=4)
    b.add_argument("--no-hot-detection", action="store_true")
    b.add_argument("--positions", action="store_true",
                   help="store token positions (enables phrase/near queries)")
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="run top-k BM25 queries against an index")
    q.add_argument("--index", required=True)
    q.add_argument("--queries", help="parquet with (query_id, text, k)")
    q.add_argument("--text", help="single ad-hoc query text")
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--mode", choices=["auto", "exact", "wand"], default="auto")
    q.add_argument("--kind",
                   choices=["topk", "and", "not", "prefix", "fuzzy",
                            "phrase", "near", "msm"],
                   default="topk",
                   help="phrase/near need an index built with --positions")
    q.add_argument("--window", type=int, default=4,
                   help="proximity window for --kind near")
    q.add_argument("--neg-text", dest="neg_text", default="",
                   help="terms to exclude for --kind not")
    q.add_argument("--min-match", dest="min_match", type=int, default=1,
                   help="distinct-term threshold for --kind msm")
    q.add_argument("--boosts", default="",
                   help='JSON term->weight map, e.g. \'{"table": 2.0}\'')
    q.add_argument("--output")
    q.add_argument("--hydrate", action="store_true",
                   help="join results back to repo/path metadata")
    q.set_defaults(fn=cmd_query)

    s = sub.add_parser("stats", help="print index metadata")
    s.add_argument("--index", required=True)
    s.set_defaults(fn=cmd_stats)

    vf = sub.add_parser(
        "verify", help="integrity-check an index (checksums, manifest)")
    vf.add_argument("--index", required=True)
    vf.set_defaults(fn=cmd_verify)

    cp = sub.add_parser(
        "compact", help="merge indexes (base + deltas) into a fresh one")
    cp.add_argument("--indexes", nargs="+", required=True)
    cp.add_argument("--output", required=True)
    cp.add_argument("--partitions", type=int, default=16)
    cp.set_defaults(fn=cmd_compact)

    rp = sub.add_parser(
        "report", help="one-row corpus report card over a parquet corpus")
    rp.add_argument("--corpus", required=True)
    rp.add_argument("--id-col", default="doc_id")
    rp.add_argument("--text-col", default="text")
    rp.add_argument("--lang-col", default="lang")
    rp.set_defaults(fn=cmd_report)

    v = sub.add_parser("serve", help="serve an index from a named Ray actor")
    v.add_argument("--index", required=True)
    v.add_argument("--name", default="donkey_index_server")
    v.add_argument("--replicas", type=int, default=1,
                   help=">1 fronts N read replicas with a ServeRouter")
    v.add_argument("--mode", choices=["auto", "exact", "wand"], default="auto")
    v.add_argument("--kind", choices=["topk", "and", "prefix", "phrase", "near"], default="topk")
    v.add_argument("--window", type=int, default=4)
    v.add_argument("--k", type=int, default=10)
    v.add_argument("--detached", action="store_true")
    v.add_argument("--ping-only", action="store_true")
    v.add_argument("--http", type=int, default=None, metavar="PORT",
                   help="serve JSON-over-HTTP on PORT instead of stdin "
                        "(0 = ephemeral; donkey A7 RPC analogue)")
    v.set_defaults(fn=cmd_serve)

    vv = sub.add_parser(
        "vserve", help="serve an IVF vector index from a named Ray actor")
    vv.add_argument("--index", required=True)
    vv.add_argument("--name", default="donkey_vector_server")
    vv.add_argument("--replicas", type=int, default=1,
                    help=">1 fronts N read replicas with a VectorRouter")
    vv.add_argument("--k", type=int, default=10)
    vv.add_argument("--nprobe", type=int, default=None)
    vv.add_argument("--detached", action="store_true")
    vv.add_argument("--ping-only", action="store_true")
    vv.add_argument("--http", type=int, default=None, metavar="PORT",
                    help="serve JSON-over-HTTP on PORT instead of stdin")
    vv.set_defaults(fn=cmd_vserve)

    ing = sub.add_parser(
        "ingest-delta",
        help="dedup a new shard against the chain's persisted artifacts "
             "(ngram/minhash/simhash), index the survivors, extend the "
             "chain (resumable per shard)")
    ing.add_argument("--state", required=True, help="chain state dir")
    ing.add_argument("--shard", required=True, help="shard parquet path")
    ing.add_argument("--shard-id", default=None,
                     help="stable id (default: sha16 of the path)")
    ing.add_argument("--text-col", default="content")
    ing.add_argument("--query-lang", default=None,
                     help="pinned by the FIRST shard")
    ing.add_argument("--auto-compact-shards", type=int, default=None,
                     help="fold the chain automatically once it reaches "
                          "this many shards (pinned by the FIRST shard)")
    ing.set_defaults(fn=cmd_ingest_delta)

    ingc = sub.add_parser(
        "ingest-compact",
        help="fold the whole ingest chain into one canonical shard "
             "(merged index + fresh global dedup artifacts)")
    ingc.add_argument("--state", required=True)
    ingc.set_defaults(fn=cmd_ingest_compact)

    rsh = sub.add_parser(
        "reshard",
        help="compact-and-reshard a quiesced sharded-writer deployment "
             "(bases + deltas, by doc_id mod new-k) into fresh shard "
             "bases; flush primaries first")
    rsh.add_argument("--shards", required=True,
                     help="comma-separated current shard base dirs")
    rsh.add_argument("--new-k", type=int, required=True)
    rsh.add_argument("--out", required=True,
                     help="output base (dirs become {out}_shard{i})")
    rsh.add_argument("--partitions", type=int, default=8)
    rsh.set_defaults(fn=cmd_reshard)

    ingq = sub.add_parser(
        "ingest-search",
        help="query the ingest chain (federated exact BM25), one query "
             "text per stdin line")
    ingq.add_argument("--state", required=True)
    ingq.add_argument("--k", type=int, default=10)
    ingq.set_defaults(fn=cmd_ingest_search)

    g = sub.add_parser("synth", help="generate a deterministic synthetic corpus")
    g.add_argument("--rows", type=int, required=True)
    g.add_argument("--output", required=True)
    g.add_argument("--seed", type=int, default=42)
    g.set_defaults(fn=cmd_synth)

    args = p.parse_args(argv)
    rc = args.fn(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
