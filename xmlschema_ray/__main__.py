"""CLI entry point.

Usage::

    python -m xmlschema_ray validate --input DIR_OR_GLOB --spec spec.json \
        --out OUT_DIR [--dim name=path ...] [--mode collect|failfast|stats_only] \
        [--num-cpus N] [--shards K] [--batch-size B] [--no-resume] \
        [--max-violations K]
    python -m xmlschema_ray spec-example            # print the flagship spec JSON
    python -m xmlschema_ray gen --out DIR --rows N  # deterministic corpus

The CLI owns the Ray session (guarded init per the embedding contract —
the library itself never calls ``ray.init``).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session(num_cpus, address=None):
    """Own the CLI's Ray session (the library never calls ``ray.init``).

    ``--address`` selects the cluster: ``local`` (default here) starts an
    in-process cluster; under ``ray job submit`` pass ``--address auto``
    (or leave RAY_ADDRESS alone and pass ``--address env``) so the driver
    ATTACHES to the submitting cluster instead of spinning a private one —
    the north-rule launch mode (``ray job submit -- python -m
    xmlschema_ray validate ...``). ``--num-cpus`` only applies when
    starting a local cluster; an attached cluster's size is the cluster's.
    """
    import os

    import ray

    if not ray.is_initialized():
        addr = address or "local"
        # --num-cpus only makes sense when THIS process starts the
        # cluster: always for "local"; for "env" only when RAY_ADDRESS is
        # unset (Ray then starts a fresh local cluster — without the cap
        # it would grab every core, which --num-cpus exists to prevent)
        starts_local = addr == "local" or (addr == "env" and not os.environ.get("RAY_ADDRESS"))
        if addr == "env":
            addr = None  # let Ray resolve RAY_ADDRESS / running cluster
        kwargs = dict(include_dashboard=False, logging_level="ERROR")
        if addr is not None:
            kwargs["address"] = addr
        if num_cpus and starts_local:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_validate(args) -> int:
    if args.export_format:
        # validate the formatter NAME before the (potentially hours-long)
        # run, not after it
        from xmlschema_ray.engine.formatters import get_formatter

        get_formatter(args.export_format)
    ray = _ray_session(args.num_cpus, getattr(args, 'address', None))
    from xmlschema_ray.constraints.serde import load_spec
    from xmlschema_ray.engine.engine import ValidationEngine

    spec = load_spec(args.spec)
    dims = {}
    for d in args.dim or []:
        name, _, path = d.partition("=")
        if not path:
            print(f"--dim must be name=path, got {d!r}", file=sys.stderr)
            return 2
        dims[name] = path
    eng = ValidationEngine(
        spec,
        batch_size=args.batch_size,
        n_shards=args.shards,
        max_violations_per_batch=args.max_violations,
    )
    res = eng.run(
        args.input,
        out_dir=args.out,
        dims=dims,
        mode=args.mode,
        resume=(not args.no_resume) and args.sample_mod is None,
        sample_mod=args.sample_mod,
    )
    if args.export_format:
        import os

        path = res.export(
            args.export_format,
            args.export_path or os.path.join(args.out, f"violations.{args.export_format}"),
        )
        print(f"exported {args.export_format} -> {path}", file=sys.stderr)
    print(json.dumps(res.summary, indent=2, default=float))
    ray.shutdown()
    return 0 if res.job_validity == "valid" else 1


def cmd_spec_example(args) -> int:
    from xmlschema_ray.constraints.serde import spec_to_json
    from xmlschema_ray.sources.synthetic import sequences_spec

    print(json.dumps(spec_to_json(sequences_spec()), indent=2))
    return 0


def cmd_gen(args) -> int:
    from xmlschema_ray.sources.synthetic import write_scaled_corpus

    seq_dir, dim_path, expected = write_scaled_corpus(
        args.out, n_rows=args.rows, n_files=args.files, seed=args.seed
    )
    print(json.dumps({"sequences": seq_dir, "sources": dim_path, "expected": expected}))
    return 0


def cmd_query(args) -> int:
    ray = _ray_session(args.num_cpus, getattr(args, 'address', None))
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as E

    qs = E.queries()
    if args.list or args.name is None:
        for name in sorted(qs):
            marker = "sql-oracled" if name in E.oracle_sql() else "rows-only"
            print(f"{name}\t{marker}")
        ray.shutdown()
        return 0
    if args.name not in qs:
        print(f"unknown query {args.name!r}; use --list", file=sys.stderr)
        ray.shutdown()
        return 2
    res = qs[args.name](args.sf_dir)
    if args.out:
        # args.out is a DIRECTORY in both cases (partitioned output layout)
        if hasattr(res, "write_parquet"):
            res.write_parquet(args.out)
        else:
            import os

            import pyarrow as pa
            import pyarrow.parquet as pq

            tbl = res if isinstance(res, pa.Table) else pa.Table.from_pandas(
                res, preserve_index=False
            )
            os.makedirs(args.out, exist_ok=True)
            pq.write_table(tbl, os.path.join(args.out, "part-0.parquet"))
        print(f"wrote {args.out}")
    else:
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        print(df.head(args.head).to_string())
        print(f"[{len(df)} rows]")
    ray.shutdown()
    return 0


def cmd_infer(args) -> int:
    """Bootstrap a spec from a parquet corpus (print JSON to stdout)."""
    ray = _ray_session(args.num_cpus, getattr(args, 'address', None))
    from xmlschema_ray.constraints.infer import infer_spec
    from xmlschema_ray.constraints.serde import spec_to_json

    spec = infer_spec(args.input, enum_threshold=args.enum_threshold)
    print(json.dumps(spec_to_json(spec), indent=2))
    ray.shutdown()
    return 0


def cmd_relax(args) -> int:
    """Suggest + print the loosest spec amendment the data needs: widened
    range/length facets, unioned enums, nullable flips (the operational
    red-run remediation loop; see ``constraints/infer.suggest_relaxations``).
    Prints the AMENDED spec JSON to stdout and the suggestion list to
    stderr; exit 0 if no amendment was needed, 3 if suggestions exist
    (so CI can gate on 'spec no longer fits the data')."""
    ray = _ray_session(args.num_cpus, getattr(args, "address", None))
    from xmlschema_ray.constraints.infer import apply_relaxations, suggest_relaxations
    from xmlschema_ray.constraints.serde import load_spec, spec_to_json

    spec = load_spec(args.spec)
    sugs = suggest_relaxations(spec, args.input, enum_cap=args.enum_cap)
    for sg in sugs:
        print(
            f"{sg['column']}: {sg['facet']} -> {sg['action']}"
            + (f" {sg['suggested'].describe()}" if sg["suggested"] is not None else "")
            + f" ({sg['detail']})",
            file=sys.stderr,
        )
    amended = apply_relaxations(spec, sugs) if sugs else spec
    print(json.dumps(spec_to_json(amended), indent=2))
    ray.shutdown()
    return 3 if sugs else 0


def cmd_compat(args) -> int:
    """Schema-evolution audit between two spec JSON documents; exit 0 iff
    every change is backward-compatible (old-valid data stays valid)."""
    from xmlschema_ray.constraints.derive import spec_compat
    from xmlschema_ray.constraints.serde import load_spec

    findings = spec_compat(load_spec(args.old), load_spec(args.new))
    print(json.dumps({"findings": findings, "backward_compatible": all(f["compatible"] for f in findings)}, indent=2))
    return 0 if all(f["compatible"] for f in findings) else 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="xmlschema_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="run the constraint engine over parquet input")
    v.add_argument("--input", required=True)
    v.add_argument("--spec", required=True)
    v.add_argument("--out", required=True)
    v.add_argument("--dim", action="append", metavar="NAME=PATH")
    v.add_argument("--mode", default="collect", choices=["collect", "failfast", "stats_only"])
    v.add_argument("--num-cpus", type=int, default=None)
    v.add_argument("--address", default=None, help="local (default) | auto | env — use auto/env under ray job submit to attach to the cluster")
    v.add_argument("--shards", type=int, default=4)
    v.add_argument("--batch-size", type=int, default=16384)
    v.add_argument("--no-resume", action="store_true")
    v.add_argument(
        "--sample-mod",
        type=int,
        default=None,
        help="canary mode: validate only the hash64(key) %% N == 0 key sample; "
        "verdicts report attempted=partial and notKnown-never-valid",
    )
    v.add_argument(
        "--max-violations",
        type=int,
        default=None,
        help="cap MATERIALIZED violation rows per batch per constraint "
        "(counts stay exact; guard for fully-broken corpora)",
    )
    v.add_argument(
        "--export-format",
        default=None,
        help="additionally render violations through a registered output "
        "formatter (jsonl-by-key, csv, ...); canonical parquet unchanged",
    )
    v.add_argument("--export-path", default=None)
    v.set_defaults(fn=cmd_validate)

    s = sub.add_parser("spec-example", help="print the flagship sequence spec as JSON")
    s.set_defaults(fn=cmd_spec_example)

    g = sub.add_parser("gen", help="generate a deterministic synthetic corpus")
    g.add_argument("--out", required=True)
    g.add_argument("--rows", type=int, default=100000)
    g.add_argument("--files", type=int, default=16)
    g.add_argument("--seed", type=int, default=42)
    g.set_defaults(fn=cmd_gen)

    q = sub.add_parser("query", help="run a named pipeline over an sf dir")
    q.add_argument("name", nargs="?", default=None)
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--out", default=None, help="write parquet instead of printing")
    q.add_argument("--head", type=int, default=10)
    q.add_argument("--num-cpus", type=int, default=None)
    q.add_argument("--address", default=None)
    q.add_argument("--list", action="store_true")
    q.set_defaults(fn=cmd_query)

    i = sub.add_parser("infer", help="bootstrap a spec JSON from a parquet corpus")
    i.add_argument("--input", required=True)
    i.add_argument("--enum-threshold", type=int, default=16)
    i.add_argument("--num-cpus", type=int, default=None)
    i.add_argument("--address", default=None)
    i.set_defaults(fn=cmd_infer)

    r = sub.add_parser(
        "relax", help="suggest the loosest spec amendment the data needs (exit 3 if any)"
    )
    r.add_argument("--input", required=True)
    r.add_argument("--spec", required=True)
    r.add_argument("--enum-cap", type=int, default=64)
    r.add_argument("--num-cpus", type=int, default=None)
    r.add_argument("--address", default=None)
    r.set_defaults(fn=cmd_relax)

    c = sub.add_parser(
        "compat", help="audit spec evolution: old-valid data still valid under new?"
    )
    c.add_argument("--old", required=True)
    c.add_argument("--new", required=True)
    c.set_defaults(fn=cmd_compat)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
