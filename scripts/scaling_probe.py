"""Probe-gated scaling capture (BASELINE.md protocol, round-4 verdict
item 4): measure the independent-numpy hardware ceiling FIRST; only
when the host window is quiet enough that embarrassingly-parallel work
itself scales >= the gate (default 0.8) is the full pipeline scaling
run worth recording.  Appends one JSON line per attempt to
/tmp/rayskema_scaling_attempts.jsonl."""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import bench

GATE = float(os.environ.get("SCALING_GATE", "0.8"))
LOG = "/tmp/rayskema_scaling_attempts.jsonl"


def main():
    rec = {"ts": time.time(), "gate": GATE}
    try:
        levels = tuple(int(x) for x in os.environ.get(
            "RAYSKEMA_SCALING_LEVELS", "2,8").split(","))
        lo, hi = levels
        rec["levels"] = list(levels)
        hw = bench._hw_ceiling(levels)
        ceiling = (hw[hi] / hw[lo]) / (hi / lo)
        rec["hw_ceiling_efficiency"] = round(ceiling, 4)
        if ceiling < GATE:
            rec["outcome"] = "skipped_noisy_host"
        else:
            env = dict(os.environ,
                       RAYSKEMA_SCALING_LEVELS=f"{lo},{hi}")
            try:
                # bench --scaling budgets up to 3600s per child
                # (2 levels x best-of-2) + corpus gen; the outer
                # timeout must exceed the worst case
                p = subprocess.run(
                    [sys.executable, os.path.join(
                        os.path.dirname(os.path.dirname(
                            os.path.abspath(__file__))), "bench.py"),
                     "--scaling"],
                    capture_output=True, text=True, timeout=16_000,
                    env=env)
            except subprocess.TimeoutExpired:
                rec["outcome"] = "timeout"
            else:
                line = [ln for ln in p.stdout.splitlines()
                        if ln.startswith("{")]
                if p.returncode == 0 and line:
                    # parse BEFORE claiming success: a truncated last
                    # line must not persist as outcome "ran"
                    rec["result"] = json.loads(line[-1])
                    rec["outcome"] = "ran"
                else:
                    rec["outcome"] = "child_failed"
                    rec["returncode"] = p.returncode
                    rec["stderr_tail"] = p.stderr[-1000:]
        print(json.dumps(rec))
    finally:
        # every attempt leaves a record, even on an unexpected raise
        with open(LOG, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
