"""CLI / ``ray job submit`` entry point.

Reference CLI contract parity (SURVEY §2.10: positional roots, ``--force_run``,
stage-specific knobs — ``ndd/shotdetect.py:124``, ``ndd/extract_images.py:247``):

    # full pipeline with checkpoints (resumable; rerun skips finished stages)
    python -m near_duplicate_detection_ray run \
        --input /path/to/transcripts_parquet --checkpoints /tmp/ndd_ckpt \
        --output /tmp/ndd_out [--tau 0.8] [--shingle-w 5] [--num-perm 128] \
        [--bands 32] [--rows-per-band 4] [--no-substring] [--force]

    # one-off query against a signatures checkpoint
    python -m near_duplicate_detection_ray query \
        --signatures /tmp/ndd_ckpt/signatures/data --text "..." [--k 30]

Owns its Ray session (guarded init) — the driver contract functions in
``__ray_entry__`` never call ray.init; this CLI does, as the standalone
entry point for ``ray job submit``.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys


def _init_ray() -> None:
    import ray

    if not ray.is_initialized():
        # RAY_ADDRESS (set to the cluster address inside `ray job submit`
        # workers) wins; the sandboxed default is an in-process local node.
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False


def cmd_run(args: argparse.Namespace) -> int:
    import ray
    import ray.data as rd

    from .config import NDDConfig
    from .stages.checkpoint import checkpointed_near_dup_pipeline

    _init_ray()
    cfg = NDDConfig(
        shingle_w=args.shingle_w,
        num_perm=args.num_perm,
        bands=args.bands,
        rows_per_band=args.rows_per_band,
        tau=args.tau,
    )
    if args.force:
        shutil.rmtree(args.checkpoints, ignore_errors=True)  # --force_run parity
    transcripts = rd.read_parquet(args.input)
    result = checkpointed_near_dup_pipeline(
        transcripts,
        args.checkpoints,
        cfg,
        input_token=args.input,
        include_substring=not args.no_substring,
    )
    if args.output:
        result["clusters"].write_parquet(args.output)
    import pyarrow.compute as pc

    ckpt = result["checkpointer"]
    n_dup = result["verified_pairs"].map_batches(
        lambda t: t.filter(pc.equal(t["method"], "minhash")), batch_format="pyarrow"
    ).count()
    print(
        json.dumps(
            {
                "clusters": result["clusters"].count(),
                "dup_pairs": n_dup,
                "stages_computed": ckpt.stages_computed,
                "stages_skipped": ckpt.stages_skipped,
                "config_hash": cfg.config_hash(),
                "output": args.output,
            }
        )
    )
    ray.shutdown()
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    import ray
    import ray.data as rd

    from .config import NDDConfig
    from .pipelines.query import NearDupIndex

    _init_ray()
    sigs = rd.read_parquet(args.signatures)
    rep_map = rd.read_parquet(args.rep_map) if args.rep_map else None
    index = NearDupIndex(sigs, NDDConfig(), rep_map=rep_map)
    print(json.dumps(index.query_text(args.text, k=args.k)))
    ray.shutdown()
    return 0


def cmd_serve(args: argparse.Namespace) -> int:
    """Serve the near-dup index over HTTP (stdlib; reference E3 parity:
    the Flask edge at ``ndd/server_ndd.py:271-315``).  Blocks until killed."""
    import ray

    from .serve import NddHttpServer

    _init_ray()
    srv = NddHttpServer(
        args.signatures, rep_map_path=args.rep_map,
        host=args.host, port=args.port, n_shards=args.n_shards,
    )
    print(json.dumps({"serving": f"http://{srv.host}:{srv.port}",
                      "size": srv.index.size(),
                      "n_shards": args.n_shards}), flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
        ray.shutdown()
    return 0


def cmd_update(args: argparse.Namespace) -> int:
    """Incremental signature-store sync — the reference's ``update_index``
    semantics (``ndd/server_ndd.py:227-261``): recompute only buckets whose
    content digest changed, evict vanished buckets, reuse the rest."""
    import ray
    import ray.data as rd

    from .config import NDDConfig
    from .stages.assemble import assemble_conversations
    from .stages.incremental import IncrementalSignatureStore

    _init_ray()
    transcripts = rd.read_parquet(args.input)
    conversations = assemble_conversations(transcripts)
    store = IncrementalSignatureStore(args.store, NDDConfig(), n_buckets=args.buckets)
    res = store.update(conversations)
    print(
        json.dumps(
            {
                "buckets_changed": res["buckets_changed"],
                "buckets_reused": res["buckets_reused"],
                "buckets_evicted": res["buckets_evicted"],
                "rows_written": res["rows_written"],
                "signatures_rows": res["signatures"].count() if res["signatures"] else 0,
            }
        )
    )
    ray.shutdown()
    return 0


def cmd_exec(args: argparse.Namespace) -> int:
    """Run any registered driver-contract query by name over an sf_dir and
    write the result as parquet (or print row count with --dry-run) — every
    operator in ``queries()`` becomes user-invocable from the CLI."""
    import importlib.util
    import os

    import ray

    entry_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "__ray_entry__.py",
    )
    spec = importlib.util.spec_from_file_location("__ray_entry__", entry_path)
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    if args.list:
        qs = entry.queries()
        print(json.dumps({"queries": sorted(qs)}))
        return 0
    _init_ray()
    qs = entry.queries()
    if args.query not in qs:
        print(json.dumps({"error": f"unknown query {args.query!r}",
                          "available": sorted(qs)}))
        return 2
    res = qs[args.query](args.sf_dir)
    if not hasattr(res, "write_parquet"):
        # a few queries return pandas DataFrames / Arrow tables directly
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        if isinstance(res, pd.DataFrame):
            res = rd.from_pandas(res)
        elif isinstance(res, pa.Table):
            res = rd.from_arrow(res)
    if args.dry_run or args.output is None:
        n = res.count() if hasattr(res, "count") else len(res)
        print(json.dumps({"query": args.query, "rows": int(n)}))
    else:
        res.write_parquet(args.output)
        print(json.dumps({"query": args.query, "output": args.output}))
    ray.shutdown()
    return 0


def cmd_report(args: argparse.Namespace) -> int:
    """Print the per-stage checkpoint manifest report (pure metadata)."""
    from .stages.checkpoint import pipeline_report

    print(json.dumps(pipeline_report(args.checkpoints), indent=2))
    return 0


def cmd_versions(args: argparse.Namespace) -> int:
    """List retained checkpoint snapshots (time-travel catalog); pure
    metadata, no Ray session."""
    from .stages.checkpoint import StageCheckpointer

    if not os.path.isdir(args.checkpoints):
        print(f"error: checkpoints dir not found: {args.checkpoints}",
              file=sys.stderr)
        return 1
    ck = StageCheckpointer(args.checkpoints)
    stages = (
        [args.stage]
        if args.stage
        else sorted(
            d for d in os.listdir(args.checkpoints)
            if os.path.isdir(os.path.join(args.checkpoints, d))
        )
    )
    print(json.dumps({s: ck.list_versions(s) for s in stages}, indent=2))
    return 0


def cmd_gc(args: argparse.Namespace) -> int:
    """Explicit checkpoint GC: prune retained snapshots beyond --keep per
    stage (current pointer and pinned versions always survive); pure
    filesystem, no Ray session."""
    from .stages.checkpoint import gc_versions

    if not os.path.isdir(args.checkpoints):
        print(f"error: checkpoints dir not found: {args.checkpoints}",
              file=sys.stderr)
        return 1
    dropped = gc_versions(args.checkpoints, stage=args.stage,
                          keep=args.keep, dry_run=args.dry_run)
    print(json.dumps({"dry_run": args.dry_run, "dropped": dropped}, indent=2))
    return 0


def cmd_forget(args: argparse.Namespace) -> int:
    """Compliance deletion: purge conversations from every checkpointed
    stage (current + history) and taint future lineage (stages/tombstone)."""
    from .stages.tombstone import forget

    if not os.path.isdir(args.checkpoints):
        print(f"error: checkpoints dir not found: {args.checkpoints}",
              file=sys.stderr)
        return 1
    ids: list[str] = []
    if args.ids:
        ids += [s for s in args.ids.split(",") if s]
    if args.ids_file:
        if not os.path.isfile(args.ids_file):
            print(f"error: ids file not found: {args.ids_file}",
                  file=sys.stderr)
            return 1
        with open(args.ids_file) as f:
            ids += [line.strip() for line in f if line.strip()]
    if not ids:
        print("error: no ids given (--ids or --ids-file)", file=sys.stderr)
        return 1
    _init_ray()
    print(json.dumps(forget(args.checkpoints, ids, dry_run=args.dry_run),
                     indent=2))
    return 0


def cmd_vdiff(args: argparse.Namespace) -> int:
    """Diff two retained snapshots of a checkpointed stage (added / removed /
    changed / unchanged keys)."""
    import ray

    from .stages.checkpoint import diff_stage_versions

    _init_ray()
    ds = diff_stage_versions(
        args.checkpoints, args.stage, args.version_a, args.version_b,
        key=args.key, value_col=args.value_col,
    )
    if args.output:
        ds.write_parquet(args.output)
        print(json.dumps({"output": args.output}))
    else:
        counts = (
            ds.groupby("change_type").count().to_pandas()
            .set_index("change_type")["count()"].to_dict()
        )
        print(json.dumps({"counts": {k: int(v) for k, v in counts.items()}}))
    ray.shutdown()
    return 0


def cmd_compact(args: argparse.Namespace) -> int:
    """Small-file compaction (streaming read -> repartition -> write)."""
    import ray

    from .sources.io import compact_parquet_dir

    _init_ray()
    stats = compact_parquet_dir(args.src, args.dst,
                                target_rows_per_file=args.target_rows)
    print(json.dumps(stats))
    ray.shutdown()
    return 0


def cmd_checksum(args: argparse.Namespace) -> int:
    """Order-insensitive table checksum (anti-entropy certificate)."""
    import ray

    from .sources.io import parquet_checksum

    _init_ray()
    print(json.dumps(parquet_checksum(args.input, args.col)))
    ray.shutdown()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="near_duplicate_detection_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="run the checkpointed near-dup pipeline")
    pr.add_argument("--input", required=True, help="transcripts parquet path/dir")
    pr.add_argument("--checkpoints", required=True, help="checkpoint root dir")
    pr.add_argument("--output", default=None, help="clusters parquet output dir")
    pr.add_argument("--tau", type=float, default=0.8)
    pr.add_argument("--shingle-w", type=int, default=5)
    pr.add_argument("--num-perm", type=int, default=128)
    pr.add_argument("--bands", type=int, default=32)
    pr.add_argument("--rows-per-band", type=int, default=4)
    pr.add_argument("--no-substring", action="store_true")
    pr.add_argument("--force", action="store_true",
                    help="wipe checkpoints first (reference --force_run parity)")
    pr.set_defaults(fn=cmd_run)

    pq = sub.add_parser("query", help="query a signatures checkpoint")
    pq.add_argument("--signatures", required=True)
    pq.add_argument("--rep-map", default=None)
    pq.add_argument("--text", required=True)
    pq.add_argument("--k", type=int, default=30)
    pq.set_defaults(fn=cmd_query)

    ps = sub.add_parser("serve", help="HTTP serving edge over a signatures checkpoint")
    ps.add_argument("--signatures", required=True)
    ps.add_argument("--rep-map", default=None)
    ps.add_argument("--host", default="127.0.0.1")
    ps.add_argument("--port", type=int, default=8977)
    ps.add_argument("--n-shards", type=int, default=1,
                    help="conv-sharded IndexShardActor fan-out (1 = in-process index)")
    ps.set_defaults(fn=cmd_serve)

    pu = sub.add_parser(
        "update", help="incrementally sync the bucket-partitioned signature store"
    )
    pu.add_argument("--input", required=True, help="transcripts parquet path/dir")
    pu.add_argument("--store", required=True, help="signature store root dir")
    pu.add_argument("--buckets", type=int, default=64)
    pu.set_defaults(fn=cmd_update)

    pe = sub.add_parser("exec", help="run a registered query over an sf_dir")
    pe.add_argument("--query", default=None)
    pe.add_argument("--list", action="store_true", help="list query names")
    pe.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    pe.add_argument("--output", default=None, help="parquet output dir")
    pe.add_argument("--dry-run", action="store_true")
    pe.set_defaults(fn=cmd_exec)

    prr = sub.add_parser("report", help="per-stage checkpoint manifest report")
    prr.add_argument("--checkpoints", required=True)
    prr.set_defaults(fn=cmd_report)

    pv = sub.add_parser("versions", help="list retained checkpoint snapshots")
    pv.add_argument("--checkpoints", required=True)
    pv.add_argument("--stage", default=None)
    pv.set_defaults(fn=cmd_versions)

    pf = sub.add_parser("forget", help="compliance-delete conversations "
                                       "from all checkpointed stages")
    pf.add_argument("--checkpoints", required=True)
    pf.add_argument("--ids", default=None, help="comma-separated conv_ids")
    pf.add_argument("--ids-file", default=None, help="one conv_id per line")
    pf.add_argument("--dry-run", action="store_true")
    pf.set_defaults(fn=cmd_forget)

    pg = sub.add_parser("gc", help="prune retained checkpoint snapshots")
    pg.add_argument("--checkpoints", required=True)
    pg.add_argument("--stage", default=None)
    pg.add_argument("--keep", type=int, default=2)
    pg.add_argument("--dry-run", action="store_true")
    pg.set_defaults(fn=cmd_gc)

    pvd = sub.add_parser("vdiff", help="diff two checkpoint snapshots")
    pvd.add_argument("--checkpoints", required=True)
    pvd.add_argument("--stage", required=True)
    pvd.add_argument("--version-a", required=True)
    pvd.add_argument("--version-b", required=True)
    pvd.add_argument("--key", required=True)
    pvd.add_argument("--value-col", required=True)
    pvd.add_argument("--output", default=None)
    pvd.set_defaults(fn=cmd_vdiff)

    pc_ = sub.add_parser("compact", help="compact small parquet files")
    pc_.add_argument("--src", required=True)
    pc_.add_argument("--dst", required=True)
    pc_.add_argument("--target-rows", type=int, default=1_000_000)
    pc_.set_defaults(fn=cmd_compact)

    pk = sub.add_parser("checksum", help="order-insensitive content checksum")
    pk.add_argument("--input", required=True, help="parquet path/dir")
    pk.add_argument("--col", required=True, help="string column to hash")
    pk.set_defaults(fn=cmd_checksum)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
