#!/usr/bin/env python
"""Benchmark entry point.

Runs the headline pipelines and prints ONE JSON line:

    {"metric": ..., "value": <flagship wall sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "turns_per_sec": ..., "rows": ...}

- input tables: ``$GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``)
- flagship transcript corpus: synthesized deterministically (cached
  under /tmp, keyed by size) per BASELINE.json input_hint — generation
  is excluded from timings
- CPUs: ``$RAY_GRAFT_CPUS`` (default 32)

``--scaling``: runs the flagship validation twice in FRESH processes
(num_cpus=8 then 32) on the same input and reports both throughputs and
the scaling efficiency (rate32/rate8)/4 — the sandbox evidence for the
north rule's N→4N ≥ 0.8 criterion (no real multi-node cluster here).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# flagship corpus size: ~6M turns at sf0.1 (scaled by the sf dir name)
_SF_TURNS = {"sf0.001": 60_000, "sf0.01": 600_000, "sf0.1": 6_000_000}


def _sf_name() -> str:
    return os.path.basename(SF_DIR.rstrip("/"))


def flagship_turns() -> int:
    override = os.environ.get("RAYSKEMA_BENCH_TURNS")
    if override:
        return int(override)
    return _SF_TURNS.get(_sf_name(), 600_000)


def ensure_corpus(n_turns: int) -> str:
    """Deterministic transcript fixture, cached across runs."""
    from rayskema.testgen import write_fixture

    d = f"/tmp/rayskema_bench_{n_turns}"
    marker = os.path.join(d, "violations_expected.parquet")
    if not os.path.exists(marker):
        write_fixture(d, n_turns, corrupt=True)
    return d


def run_flagship(corpus: str, num_cpus: int) -> dict:
    """Full constraint suite over the transcript corpus; returns wall
    time, row count, violations."""
    import ray
    from rayskema.pipelines.validate import ValidateConfig, validate
    from rayskema.schema import transcript_schema
    from rayskema.state.sketches import ColumnProfile

    with open(os.path.join(corpus, "baseline_profile.bin"), "rb") as f:
        baseline = ColumnProfile.from_bytes(f.read())
    cfg = ValidateConfig(
        buckets=max(32, num_cpus * 2),
        # autoscaling pool capped below the cluster size: never a fixed
        # pool sized to the whole cluster (starves sibling stages), and
        # leave headroom for the concurrent keys-pass shuffle
        concurrency=(1, max(2, num_cpus - 8)),
        concurrent_passes=True,
    )
    # warm up the worker pool (process spawn + imports) outside the
    # timed region — cluster provisioning isn't pipeline throughput
    import ray.data as rd
    rd.range(num_cpus * 2, override_num_blocks=num_cpus * 2).map_batches(
        lambda b: b, batch_format="pyarrow").materialize()
    t0 = time.perf_counter()
    res = validate(
        os.path.join(corpus, "transcripts"), transcript_schema(),
        manifest_path=os.path.join(corpus, "conversations.parquet"),
        baseline_profile=baseline, config=cfg)
    wall = time.perf_counter() - t0
    return {
        "wall_sec": wall,
        "rows": res.metrics.get("rows_validated") or 0,
        "violations": res.violations.num_rows,
        "stage_sec": res.metrics.get("stage_sec", {}),
    }


def run_queries(sf_dir: str) -> dict:
    """Time each driver-contract query over the sf tables."""
    import __ray_entry__ as entrymod
    import pyarrow as pa
    import ray
    import ray.data as rd

    out = {}
    for name, fn in entrymod.queries().items():
        if name == "transcript_validate":
            continue  # timed separately as the flagship
        t0 = time.perf_counter()
        res = fn(sf_dir)
        if isinstance(res, rd.Dataset):
            for _ in res.iter_batches(batch_format="pyarrow"):
                pass
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def child_main(num_cpus: int, corpus: str) -> None:
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    r = run_flagship(corpus, num_cpus)
    ray.shutdown()
    print("CHILD_RESULT " + json.dumps(r))


def scaling_main() -> None:
    n_turns = int(os.environ.get("RAYSKEMA_SCALING_TURNS",
                                 str(flagship_turns())))
    corpus = ensure_corpus(n_turns)
    rates = {}
    walls = {}
    for cpus in (8, 32):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             "--num-cpus", str(cpus), "--corpus", corpus],
            capture_output=True, text=True, timeout=3600)
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("CHILD_RESULT ")]
        if not line:
            sys.stderr.write(p.stdout[-2000:] + p.stderr[-4000:])
            raise RuntimeError(f"child (num_cpus={cpus}) failed")
        r = json.loads(line[-1][len("CHILD_RESULT "):])
        walls[cpus] = r["wall_sec"]
        rates[cpus] = r["rows"] / r["wall_sec"]
    eff = (rates[32] / rates[8]) / 4.0
    print(json.dumps({
        "metric": "scaling_efficiency_8_to_32_cpus",
        "value": round(eff, 4),
        "unit": "ratio",
        "turns": n_turns,
        "turns_per_sec_8": round(rates[8]),
        "turns_per_sec_32": round(rates[32]),
        "wall_sec_8": round(walls[8], 2),
        "wall_sec_32": round(walls[32], 2),
        "target": 0.8,
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=NUM_CPUS)
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--skip-queries", action="store_true")
    args = ap.parse_args()

    if args.child:
        child_main(args.num_cpus, args.corpus)
        return
    if args.scaling:
        scaling_main()
        return

    import ray
    n_turns = flagship_turns()
    corpus = ensure_corpus(n_turns)
    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    flag = run_flagship(corpus, args.num_cpus)
    queries = {} if args.skip_queries else run_queries(SF_DIR)
    ray.shutdown()

    print(json.dumps({
        "metric": "transcript_validate_full_wall",
        "value": round(flag["wall_sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": _sf_name(),
        "num_cpus": args.num_cpus,
        "rows": flag["rows"],
        "turns_per_sec": round(flag["rows"] / flag["wall_sec"]),
        "violations": flag["violations"],
        "stage_sec": flag["stage_sec"],
    }))


if __name__ == "__main__":
    main()
