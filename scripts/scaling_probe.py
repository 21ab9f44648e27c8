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
    levels = tuple(int(x) for x in os.environ.get(
        "RAYSKEMA_SCALING_LEVELS", "2,8").split(","))
    lo, hi = levels
    hw = bench._hw_ceiling(levels)
    ceiling = (hw[hi] / hw[lo]) / (hi / lo)
    rec = {"ts": time.time(), "levels": list(levels),
           "hw_ceiling_efficiency": round(ceiling, 4), "gate": GATE}
    if ceiling < GATE:
        rec["outcome"] = "skipped_noisy_host"
        print(json.dumps(rec))
    else:
        env = dict(os.environ,
                   RAYSKEMA_SCALING_LEVELS=f"{lo},{hi}")
        p = subprocess.run(
            [sys.executable, os.path.join(
                os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))), "bench.py"),
             "--scaling"],
            capture_output=True, text=True, timeout=3000, env=env)
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("{")]
        rec["outcome"] = "ran"
        rec["result"] = json.loads(line[-1]) if line else None
        print(json.dumps(rec))
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
