"""CLI driver (reference analogue: middleware/cmd adapters, SURVEY §2.11
X9): ``python -m rayskema <command>``.

Commands:
  validate   run the full constraint suite over Parquet shards
             (checkpointed + resumable when --out is given)
  normalize  write the canonical normalized dataset
  contract   export the built-in transcript contract, or echo a contract
             file back after a round-trip (schema tooling)
  fixture    generate the deterministic synthetic transcript corpus

This is the ``ray job submit``-able entry point: on a cluster, run
``ray job submit -- python -m rayskema validate --input ... --out ...``
— the script only calls ``ray.init`` when no cluster is attached.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ensure_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), **kwargs)


def _load_schema(args):
    if args.contract:
        from .contract import load_contract
        return load_contract(args.contract)
    from .schema import transcript_schema
    return transcript_schema()


def cmd_validate(args) -> int:
    _ensure_ray(args.num_cpus)
    from .pipelines.validate import ValidateConfig, validate
    from .state.sketches import ColumnProfile

    schema = _load_schema(args)
    baseline = None
    if args.baseline_profile and os.path.exists(args.baseline_profile):
        with open(args.baseline_profile, "rb") as f:
            baseline = ColumnProfile.from_bytes(f.read())
    cfg = ValidateConfig(buckets=args.buckets)
    if args.out:
        from .pipelines.checkpoint import run_checkpointed
        res = run_checkpointed(
            args.input, schema, args.out, manifest_path=args.manifest,
            baseline_profile=baseline, config=cfg)
        print(json.dumps(res.run_manifest))
        return 0 if res.run_manifest.get("passed", False) else 1
    res = validate(args.input, schema, manifest_path=args.manifest,
                   baseline_profile=baseline, config=cfg)
    print(json.dumps({
        "passed": res.passed, "metrics": res.metrics,
        "drift": res.drift,
    }))
    if args.violations_out:
        import pyarrow.parquet as pq
        pq.write_table(res.violations, args.violations_out)
    return 0 if res.passed else 1


def cmd_normalize(args) -> int:
    _ensure_ray(args.num_cpus)
    from .pipelines.validate import normalize_dataset

    schema = _load_schema(args)
    ds = normalize_dataset(args.input, schema)
    ds.write_parquet(args.out)
    print(json.dumps({"written": args.out}))
    return 0


def cmd_contract(args) -> int:
    from .contract import load_contract, save_contract
    from .schema import transcript_schema

    if args.from_openapi:
        from .contract_openapi import import_openapi
        with open(args.from_openapi) as f:
            schema, diag = import_openapi(f.read(), name="imported")
        for w in diag.warnings:
            print(f"warning: {w}", file=sys.stderr)
    else:
        schema = load_contract(args.contract) if args.contract \
            else transcript_schema()
    if args.json_schema:
        from .jsonschema import export_json_schema
        with open(args.out, "w") as f:
            json.dump(export_json_schema(schema, wrap=True), f, indent=2,
                      sort_keys=True)
    else:
        save_contract(schema, args.out)
    print(json.dumps({"written": args.out,
                      "schema_hash": schema.schema_hash()}))
    return 0


def cmd_diff(args) -> int:
    """Contract compatibility report (registry BACKWARD/FORWARD
    semantics — evolution.py): exit 0 when the change set satisfies
    ``--require`` (default ``backward``), 1 otherwise — CI-gateable
    before a contract rollout."""
    from .contract import load_contract
    from .evolution import changes_table, compatibility, diff_schemas

    changes = diff_schemas(load_contract(args.old),
                           load_contract(args.new))
    verdict = compatibility(changes)
    for row in changes_table(changes).to_pylist():
        print(json.dumps(row, sort_keys=True))
    print(json.dumps({"compatibility": verdict,
                      "n_changes": len(changes)}))
    ok = {"full": ("full",),
          "backward": ("full", "backward"),
          "forward": ("full", "forward"),
          "none": ("full", "backward", "forward", "none")}
    return 0 if verdict in ok[args.require] else 1


def cmd_snapshot(args) -> int:
    """Snapshot-table maintenance (sources/snapshot.py): write /
    history / compact / changes — the ray-job-submittable face of the
    manifest layout."""
    from .sources import snapshot as snap

    if args.action == "history":
        for h in snap.snapshot_history(args.root):
            print(json.dumps(h, sort_keys=True))
        return 0
    if args.action in ("branch", "tag"):
        if not args.name:
            print(f"--name required for {args.action}",
                  file=sys.stderr)
            return 2
        fn = (snap.create_branch if args.action == "branch"
              else snap.create_tag)
        try:
            sid = fn(args.root, args.name, at=args.at,
                     from_ref=args.ref or "main")
        except (FileNotFoundError, FileExistsError) as ex:
            print(str(ex), file=sys.stderr)
            return 2
        print(json.dumps({args.action: args.name, "at": sid}))
        return 0
    if args.action == "refs":
        print(json.dumps(snap.list_refs(args.root), sort_keys=True))
        return 0
    _ensure_ray(args.num_cpus)
    import ray.data as rd
    if args.action == "write":
        if not args.input:
            print("--input required for write", file=sys.stderr)
            return 2
        contract = None
        if args.contract:
            from .contract import load_contract
            contract = load_contract(args.contract)
        m = snap.write_snapshot(
            rd.read_parquet(args.input), args.root,
            stats_cols=tuple((args.stats_cols or "").split(","))
            if args.stats_cols else (),
            bloom_cols=tuple((args.bloom_cols or "").split(","))
            if args.bloom_cols else (),
            mode=args.mode, contract=contract,
            branch=args.branch or "main")
        print(json.dumps({"id": m["id"], "rows": m["rows"],
                          "files": len(m["files"])}))
        return 0
    if args.action == "upsert":
        if not args.input or not args.keys:
            print("--input/--keys required for upsert",
                  file=sys.stderr)
            return 2
        contract = None
        if args.contract:
            from .contract import load_contract
            contract = load_contract(args.contract)
        m = snap.upsert_snapshot(
            rd.read_parquet(args.input), args.root,
            args.keys.split(",")[0], contract=contract,
            branch=args.branch or "main")
        print(json.dumps({"id": m["id"], "rows": m["rows"],
                          "files": len(m["files"]),
                          "rewritten": m.get("files_rewritten"),
                          "carried": m.get("files_carried")}))
        return 0
    if args.action == "delete":
        if not args.where:
            print("--where col,op,value required for delete",
                  file=sys.stderr)
            return 2
        conj = []
        for w in args.where:
            col, op, val = w.split(",", 2)
            for cast in (int, float):
                try:
                    val = cast(val)
                    break
                except ValueError:
                    pass
            conj.append((col, op, val))
        m = snap.delete_snapshot(args.root, conj,
                                 branch=args.branch or "main")
        print(json.dumps({"id": m["id"], "rows": m["rows"],
                          "dropped": m.get("files_dropped"),
                          "rewritten": m.get("files_rewritten"),
                          "carried": m.get("files_carried")}))
        return 0
    if args.action == "compact":
        m = snap.compact_snapshot(args.root,
                                  target_rows=args.target_rows,
                                  order_by=args.order_by,
                                  branch=args.branch or "main")
        print(json.dumps({"id": m["id"], "rows": m["rows"],
                          "files": len(m["files"])}))
        return 0
    if args.action == "changes":
        if args.since is None or not args.keys or not args.out:
            print("--since/--keys/--out required for changes",
                  file=sys.stderr)
            return 2
        ds = snap.snapshot_changes(
            args.root, from_snapshot=args.since,
            key_cols=tuple(args.keys.split(",")),
            compare_cols=tuple(args.compare.split(","))
            if args.compare else ())
        ds.write_parquet(args.out)
        print(json.dumps({"written": args.out}))
        return 0
    print(f"unknown action {args.action!r}", file=sys.stderr)
    return 2


def cmd_sample(args) -> int:
    _ensure_ray(args.num_cpus)
    import ray.data as rd

    from .functions.sampling import seeded_sample

    ds = rd.read_parquet(args.input)
    out = seeded_sample(ds, args.fraction, seed=args.seed, key=args.key)
    out.write_parquet(args.out)
    n = out.count()
    print(json.dumps({"written": args.out, "rows": n,
                      "fraction": args.fraction, "seed": args.seed,
                      "key": args.key}))
    return 0


def cmd_gen(args) -> int:
    from .codegen import compile_schema

    schema = _load_schema(args)
    src = compile_schema(schema, args.out)
    print(json.dumps({
        "out": args.out, "schema": schema.name,
        "schema_hash": schema.schema_hash(),
        "lines": src.count("\n")}))
    return 0


def cmd_fixture(args) -> int:
    from .testgen import write_fixture

    info = write_fixture(args.out, args.turns, corrupt=args.corrupt,
                         drifted=args.drifted)
    print(json.dumps(info))
    return 0


def cmd_infer(args) -> int:
    _ensure_ray(args.num_cpus)
    import ray.data as rd

    from .contract import save_contract
    from .functions.infer import infer_contract

    ds = rd.read_parquet(args.input)
    keys = [k for k in (args.keys or "").split(",") if k]
    schema = infer_contract(ds, key_columns=keys,
                            enum_max=args.enum_max, name=args.name)
    save_contract(schema, args.out)
    print(json.dumps({
        "out": args.out, "schema": schema.name,
        "schema_hash": schema.schema_hash(),
        "columns": len(schema.columns),
        "constraints": sum(len(c.constraints) for c in schema.columns)}))
    return 0


def cmd_serve(args) -> int:
    """Admission-webhook server over a CRD contract (reference
    examples/k8s_webhook_poc/main.go:72-126): stdlib WSGI, /healthz +
    /validate, no Ray session — single-record validation reuses the
    compiled plan."""
    from wsgiref.simple_server import make_server

    from .serving import AdmissionWebhook, ParseLimits, make_wsgi_app

    with open(args.crd, "rb") as f:
        doc = f.read()
    wh = AdmissionWebhook(
        doc, kind=args.kind,
        limits=ParseLimits(max_bytes=args.max_bytes,
                           max_depth=args.max_depth))
    app = make_wsgi_app(wh)
    if args.check_only:
        print(json.dumps({"expected": wh.expected,
                          "warnings": wh.diag.warnings}))
        return 0
    httpd = make_server(args.host, args.port, app)
    print(json.dumps({"listening": f"{args.host}:{args.port}",
                      "expected": wh.expected}))
    httpd.serve_forever()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="rayskema")
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate")
    v.add_argument("--input", required=True,
                   help="parquet file/dir of transcript shards")
    v.add_argument("--contract", help="JSON contract (default: built-in "
                   "transcript schema)")
    v.add_argument("--manifest", help="conversations manifest parquet")
    v.add_argument("--baseline-profile", help="drift baseline sketch file")
    v.add_argument("--out", help="checkpoint dir => resumable run")
    v.add_argument("--violations-out", help="violations parquet path "
                   "(non-checkpointed mode)")
    v.add_argument("--buckets", type=int, default=64)
    v.add_argument("--num-cpus", type=int)
    v.set_defaults(fn=cmd_validate)

    n = sub.add_parser("normalize")
    n.add_argument("--input", required=True)
    n.add_argument("--contract")
    n.add_argument("--out", required=True)
    n.add_argument("--num-cpus", type=int)
    n.set_defaults(fn=cmd_normalize)

    c = sub.add_parser("contract")
    c.add_argument("--contract", help="round-trip an existing contract")
    c.add_argument("--from-openapi", help="import an OpenAPI/CRD schema "
                   "document (X8)")
    c.add_argument("--json-schema", action="store_true",
                   help="write standard JSON Schema instead of the "
                   "native contract format")
    c.add_argument("--out", required=True)
    c.set_defaults(fn=cmd_contract)

    d = sub.add_parser("diff", help="contract compatibility report "
                       "(BACKWARD/FORWARD registry semantics)")
    d.add_argument("--old", required=True, help="old contract JSON")
    d.add_argument("--new", required=True, help="new contract JSON")
    d.add_argument("--require", default="backward",
                   choices=["full", "backward", "forward", "none"],
                   help="minimum compatibility for exit code 0")
    d.set_defaults(fn=cmd_diff)

    sn = sub.add_parser("snapshot", help="manifest-tracked snapshot "
                        "tables: write/history/compact/changes/"
                        "upsert/branch/tag/refs")
    sn.add_argument("--root", required=True)
    sn.add_argument("--action", required=True,
                    choices=["write", "history", "compact", "changes",
                             "upsert", "delete", "branch", "tag",
                             "refs"])
    sn.add_argument("--branch", help="commit target branch "
                    "(write/upsert/delete/compact; default main)")
    sn.add_argument("--name", help="branch/tag name")
    sn.add_argument("--ref", help="base ref for branch/tag "
                    "(default main)")
    sn.add_argument("--at", type=int, help="pin branch/tag to this "
                    "snapshot id (default: resolved --ref)")
    sn.add_argument("--where", action="append",
                    help="delete conjunct 'col,op,value' (repeatable)")
    sn.add_argument("--input", help="parquet file/dir (write/upsert)")
    sn.add_argument("--stats-cols", help="comma-separated prune cols")
    sn.add_argument("--bloom-cols", help="comma-separated point-"
                    "lookup Bloom cols (write)")
    sn.add_argument("--mode", default="overwrite",
                    choices=["overwrite", "append"])
    sn.add_argument("--contract", help="validated-commit gate (write)")
    sn.add_argument("--target-rows", type=int, default=1_000_000)
    sn.add_argument("--order-by", help="re-cluster column (compact)")
    sn.add_argument("--since", type=int, help="from snapshot (changes)")
    sn.add_argument("--keys", help="comma-separated key cols (changes)")
    sn.add_argument("--compare", help="comma-separated compare cols")
    sn.add_argument("--out", help="output parquet dir (changes)")
    sn.add_argument("--num-cpus", type=int)
    sn.set_defaults(fn=cmd_snapshot)

    s = sub.add_parser("sample", help="seeded deterministic sample "
                       "(cheap drift pre-check input)")
    s.add_argument("--input", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--fraction", type=float, required=True)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--key", help="content-keyed sampling column "
                   "(deterministic across any block layout)")
    s.add_argument("--num-cpus", type=int)
    s.set_defaults(fn=cmd_sample)

    g = sub.add_parser("gen", help="ahead-of-time compile a contract "
                       "to a standalone validator module (reference "
                       "`goskema compile`, cmd/goskema/main.go:23-38)")
    g.add_argument("--contract", help="JSON/YAML contract (default: "
                   "built-in transcript schema)")
    g.add_argument("--out", required=True, help="generated .py path")
    g.set_defaults(fn=cmd_gen)

    f = sub.add_parser("fixture")
    f.add_argument("--out", required=True)
    f.add_argument("--turns", type=int, default=20000)
    f.add_argument("--corrupt", action="store_true")
    f.add_argument("--drifted", action="store_true")
    f.set_defaults(fn=cmd_fixture)

    i = sub.add_parser("infer", help="propose the tightest contract "
                       "the observed Parquet data satisfies")
    i.add_argument("--input", required=True, help="parquet file/dir")
    i.add_argument("--out", required=True, help="contract JSON path")
    i.add_argument("--keys", help="comma-separated key columns")
    i.add_argument("--enum-max", type=int, default=16)
    i.add_argument("--name", default="inferred")
    i.add_argument("--num-cpus", type=int)
    i.set_defaults(fn=cmd_infer)

    w = sub.add_parser("serve", help="admission-webhook server over a "
                       "CRD contract (single-record validation, no Ray)")
    w.add_argument("--crd", required=True, help="CRD YAML/JSON path")
    w.add_argument("--kind", help="override the expected Kind")
    w.add_argument("--host", default="127.0.0.1")
    w.add_argument("--port", type=int, default=18080)
    w.add_argument("--max-bytes", type=int, default=10 << 20)
    w.add_argument("--max-depth", type=int, default=256)
    w.add_argument("--check-only", action="store_true",
                   help="import the CRD, print expected GVR + import "
                        "warnings, exit")
    w.set_defaults(fn=cmd_serve)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
