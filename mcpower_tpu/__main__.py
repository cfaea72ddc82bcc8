"""CLI host: run contract files against the engine from OUTSIDE Python.

This is the second host the reference's architecture demands ("one engine,
four ports" — hosts are marshalling shells over the contract boundary,
web/documentation/internals/engine-architecture.md:5-13). It consumes
label-free contract files (msgpack, the reference's FFI encoding, or JSON),
validates them through the single gate, runs the two entry operations, and
emits the host-neutral result tree as JSON.

    python -m mcpower_tpu validate contracts.msgpack
    python -m mcpower_tpu run contracts.msgpack --n 200 [--n-sims 1000]
    python -m mcpower_tpu search contracts.msgpack --from 50 --to 400
"""

from __future__ import annotations

import argparse
import json
import sys


def _load(path: str):
    from .contract import wire

    contracts = wire.load(path)
    if not contracts:
        raise SystemExit(f"{path}: no contracts found")
    return contracts


def _target_labels(contract) -> list:
    out = []
    for t in contract.test.targets:
        kind = t[0]
        if kind == "marginal":
            out.append(f"term_{t[1]}")
        elif kind == "contrast":
            out.append(f"contrast_{t[1]}_vs_{t[2]}")
        else:
            out.append("joint")
    return out


def _lowered(contracts, grid):
    from .engine.adapter import contract_to_lowered
    from .orchestrator import runner

    lowered = []
    for i, c in enumerate(contracts):
        label = c.scenario.label if c.scenario else f"scenario_{i}"
        spec, arrays = contract_to_lowered(c, grid)
        lowered.append(
            runner.LoweredScenario(
                label=label,
                spec=spec,
                arrays=arrays,
                target_labels=_target_labels(c),
            )
        )
    return lowered


def cmd_validate(args) -> int:
    from .contract.validate import ContractError, validate

    contracts = _load(args.file)
    failures = 0
    for i, c in enumerate(contracts):
        try:
            validate(c)
            print(f"contract[{i}]: OK")
        except ContractError as e:
            failures += 1
            print(f"contract[{i}]: INVALID — {e}", file=sys.stderr)
    return 1 if failures else 0


def cmd_run(args) -> int:
    from .orchestrator import grid as gridmod, runner

    contracts = _load(args.file)
    probe = _lowered(contracts[:1], [max(int(args.n), 4)])[0]
    n_snapped, _ = gridmod.snap_single_n(probe.spec.cluster, int(args.n))
    lowered = _lowered(contracts, [n_snapped])
    out = runner.find_power(
        lowered,
        n_sims=int(args.n_sims),
        base_seed=int(args.seed),
        sim_id_offset=int(args.sim_offset),
        progress=_progress_cb(args),
    )
    json.dump(out, _out_fh(args), indent=None if args.compact else 2)
    print(file=_out_fh(args))
    return 0


def cmd_search(args) -> int:
    from .orchestrator import grid as gridmod, runner

    contracts = _load(args.file)
    probe = _lowered(contracts[:1], [max(int(args.to), 4)])[0]
    atom = gridmod.cluster_atom(probe.spec.cluster)
    hard_min = gridmod.hard_min_n(probe.spec.cluster)
    grid_ns, _warnings = gridmod.build_grid(
        int(getattr(args, "from")), int(args.to), args.by, args.mode,
        atom, hard_min,
    )
    lowered = _lowered(contracts, grid_ns)
    out = runner.find_sample_size(
        lowered,
        n_sims=int(args.n_sims),
        base_seed=int(args.seed),
        target_power=float(args.target_power),
        atom=atom,
        sim_id_offset=int(args.sim_offset),
        progress=_progress_cb(args),
    )
    json.dump(out, _out_fh(args), indent=None if args.compact else 2)
    print(file=_out_fh(args))
    return 0


def cmd_merge(args) -> int:
    """Pool per-worker part files into one result (host worker-pool verb).

    Each part is the JSON a ``run``/``search`` invocation wrote; workers
    must have run DISJOINT --sim-offset ranges of the same contract file
    and seed (merge.split_sims convention). Counters pool exactly; every
    rate, CI, and sample-size output is re-derived from the pooled
    counters — the reference's merge boundary (engine-orchestrator/src/
    merge.rs:26,242; reachable from its wasm host), here a CLI verb so a
    cross-machine pool needs nothing but files.
    """
    from .orchestrator.merge import merge_power_results

    parts: list = []
    for path in args.files:
        with open(path) as fh:
            parts.append(json.load(fh))
    labels = list(parts[0].keys())
    for i, p in enumerate(parts[1:], 1):
        if list(p.keys()) != labels:
            raise SystemExit(
                f"{args.files[i]}: scenario labels {list(p.keys())} != "
                f"{labels} from {args.files[0]}"
            )
    out = {
        label: merge_power_results([p[label] for p in parts])
        for label in labels
    }
    json.dump(out, _out_fh(args), indent=None if args.compact else 2)
    print(file=_out_fh(args))
    return 0


def cmd_app_run(args) -> int:
    """Power at one N for an AppSpec JSON document — the GUI/R host verb.

    Same boundary as the reference's engine-app-spec driver
    (crates/engine-app-spec/src/driver.rs run_find_power): the caller never
    touches engine types, only the tagged AppSpec JSON in and the
    host-neutral payload {result, plots, summary} out. ports/r/mcpower.R is
    a second-language host built entirely on this verb.
    """
    from .appspec import run_find_power

    with open(args.file) as fh:
        doc = fh.read()
    payload = run_find_power(doc, int(args.n), progress=_progress_cb(args))
    json.dump(payload, _out_fh(args), indent=None if args.compact else 2)
    print(file=_out_fh(args))
    return 0


def cmd_app_search(args) -> int:
    """Sample-size search for an AppSpec JSON document (GUI/R host verb)."""
    from .appspec import run_find_sample_size

    with open(args.file) as fh:
        doc = fh.read()
    payload = run_find_sample_size(
        doc,
        from_size=getattr(args, "from") and int(getattr(args, "from")),
        to_size=args.to and int(args.to),
        by=args.by,
        progress=_progress_cb(args),
    )
    json.dump(payload, _out_fh(args), indent=None if args.compact else 2)
    print(file=_out_fh(args))
    return 0


def cmd_serve(args) -> int:
    """Local GUI host: browser shell over the AppSpec driver boundary."""
    from .appspec.serve import serve

    serve(
        host=args.host,
        port=args.port,
        open_browser=not args.no_open,
    )
    return 0


def _out_fh(args):
    if getattr(args, "_fh", None) is None:
        args._fh = open(args.out, "w") if args.out else sys.stdout
    return args._fh


def _progress_cb(args):
    """--progress: machine-readable JSONL ticks on stderr, one per dispatch
    chunk — the stream a second-language host (ports/r/mcpower.R) surfaces
    while the result JSON rides --out/stdout untouched. The reference's R
    bridge polls a shared progress cell from the main thread
    (engine-r progress.rs); over a process boundary the equivalent is this
    stderr event stream plus killing the worker (cancel)."""
    if not getattr(args, "progress", False):
        return None

    def cb(done: int, total: int) -> bool:
        print(
            json.dumps(
                {"event": "progress", "done": int(done), "total": int(total)}
            ),
            file=sys.stderr,
            flush=True,
        )
        return True

    return cb


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="mcpower_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="validate contract file(s)")
    v.add_argument("file")
    v.set_defaults(fn=cmd_validate)

    r = sub.add_parser("run", help="power at a single N")
    r.add_argument("file")
    r.add_argument("--n", required=True, type=int, help="sample size")
    r.add_argument("--n-sims", default=1600, type=int)
    r.add_argument("--seed", default=2137, type=int)
    r.add_argument("--sim-offset", default=0, type=int,
                   help="global sim-id range start (worker pools: disjoint "
                        "ranges of one seed, pooled with the merge verb)")
    r.add_argument("--out", default=None)
    r.add_argument("--compact", action="store_true")
    r.add_argument("--progress", action="store_true",
              help="JSONL progress ticks on stderr")
    r.set_defaults(fn=cmd_run)

    s = sub.add_parser("search", help="sample-size search over a CRN grid")
    s.add_argument("file")
    s.add_argument("--from", dest="from", required=True, type=int)
    s.add_argument("--to", required=True, type=int)
    s.add_argument("--by", default="auto")
    s.add_argument("--mode", default="linear", choices=["linear", "log"])
    s.add_argument("--target-power", default=80.0, type=float)
    s.add_argument("--n-sims", default=1600, type=int)
    s.add_argument("--seed", default=2137, type=int)
    s.add_argument("--sim-offset", default=0, type=int,
                   help="global sim-id range start (worker pools)")
    s.add_argument("--out", default=None)
    s.add_argument("--compact", action="store_true")
    s.add_argument("--progress", action="store_true",
              help="JSONL progress ticks on stderr")
    s.set_defaults(fn=cmd_search)

    mg = sub.add_parser(
        "merge", help="pool per-worker run/search part files (counter merge)"
    )
    mg.add_argument("files", nargs="+")
    mg.add_argument("--out", default=None)
    mg.add_argument("--compact", action="store_true")
    mg.set_defaults(fn=cmd_merge)

    ar = sub.add_parser(
        "app-run", help="power at a single N for an AppSpec JSON document"
    )
    ar.add_argument("file")
    ar.add_argument("--n", required=True, type=int, help="sample size")
    ar.add_argument("--out", default=None)
    ar.add_argument("--compact", action="store_true")
    ar.add_argument("--progress", action="store_true",
               help="JSONL progress ticks on stderr")
    ar.set_defaults(fn=cmd_app_run)

    asrch = sub.add_parser(
        "app-search", help="sample-size search for an AppSpec JSON document"
    )
    asrch.add_argument("file")
    asrch.add_argument("--from", dest="from", default=None)
    asrch.add_argument("--to", default=None)
    asrch.add_argument("--by", default=None)
    asrch.add_argument("--out", default=None)
    asrch.add_argument("--compact", action="store_true")
    asrch.add_argument("--progress", action="store_true",
                  help="JSONL progress ticks on stderr")
    asrch.set_defaults(fn=cmd_app_search)

    srv = sub.add_parser(
        "serve", help="local GUI host (browser app over the AppSpec boundary)"
    )
    srv.add_argument("--host", default="127.0.0.1")
    srv.add_argument("--port", type=int, default=8321)
    srv.add_argument("--no-open", action="store_true",
                     help="do not open a browser tab")
    srv.set_defaults(fn=cmd_serve)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
