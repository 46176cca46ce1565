"""Witness-gated scaling-run watcher.

The sandbox host intermittently (a) steals CPU for external tenants and
(b) throttles fresh-page first-touch allocation ~100-250x (see
BASELINE.md, round-4 session-4 notes).  Either pathology invalidates a
two-level scaling sample, so rather than run `bench.py --scaling` at an
arbitrary time, this watcher probes the host every PROBE_EVERY seconds
and fires the scaling run only when the box is clean:

    steal < MAX_STEAL_PCT  AND  first-touch alloc >= MIN_ALLOC_GBPS
    on two consecutive probes RECHECK_GAP seconds apart.

Every probe (clean or not) is appended to the log so the full host
history of the watch is on record — the protocol reports all samples,
not just the ones that fired.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PROBE_EVERY = int(os.environ.get("WATCH_PROBE_EVERY", "180"))
RECHECK_GAP = int(os.environ.get("WATCH_RECHECK_GAP", "10"))
MAX_STEAL_PCT = float(os.environ.get("WATCH_MAX_STEAL", "1.0"))
MIN_ALLOC_GBPS = float(os.environ.get("WATCH_MIN_ALLOC", "1.5"))
MAX_FIRES = int(os.environ.get("WATCH_MAX_FIRES", "2"))
OUT_DIR = os.environ.get("WATCH_OUT_DIR", "/tmp/scaling_watch")


def _cpu_times() -> list[int]:
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


def probe() -> dict:
    """One host-health sample: 3 s steal window + first-touch alloc."""
    import numpy as np

    s0 = _cpu_times()
    t0 = time.perf_counter()
    a = np.ones(25_000_000, dtype=np.float64)  # 200 MB fresh pages
    alloc = a.nbytes / (time.perf_counter() - t0) / 1e9
    del a
    time.sleep(3)
    s1 = _cpu_times()
    d = [b - x for x, b in zip(s0, s1)]
    steal = 100.0 * d[7] / max(1, sum(d))
    return {
        "ts": round(time.time(), 1),
        "steal_pct": round(steal, 2),
        "alloc_gbps": round(alloc, 2),
    }


def clean(p: dict) -> bool:
    return p["steal_pct"] < MAX_STEAL_PCT and p["alloc_gbps"] >= MIN_ALLOC_GBPS


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    log = os.path.join(OUT_DIR, "probes.jsonl")
    fires = 0
    while fires < MAX_FIRES:
        p = probe()
        with open(log, "a") as f:
            f.write(json.dumps(p) + "\n")
        if clean(p):
            time.sleep(RECHECK_GAP)
            p2 = probe()
            p2["recheck"] = True
            with open(log, "a") as f:
                f.write(json.dumps(p2) + "\n")
            if clean(p2):
                out = os.path.join(OUT_DIR, f"scaling_{fires}.json")
                with open(log, "a") as f:
                    f.write(json.dumps({"fired": out, "ts": time.time()}) + "\n")
                with open(out, "w") as fo:
                    subprocess.run(
                        [sys.executable, os.path.join(REPO, "bench.py"), "--scaling"],
                        stdout=fo,
                        stderr=subprocess.STDOUT,
                        cwd=REPO,
                        timeout=3600,
                    )
                fires += 1
                continue
        time.sleep(PROBE_EVERY)


if __name__ == "__main__":
    main()
