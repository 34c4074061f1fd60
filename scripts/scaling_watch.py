"""Quiet-window hunter for the 4->16 scaling point.

The CPU multiprocessing probe (bench._probe16) cannot see the disk /
page-cache regime that poisons the 16-cpu crawl leg (BASELINE.md: two
round-5 attempts rejected with quiet CPU probes).  This watcher gates a
scaling launch on BOTH signals:

  1. CPU probe >= PROBE_MIN x the 6,403 pages/s quiet reference, and
  2. a crawl-only 16-cpu sentinel <= SENTINEL_MAX_SEC (canonical 38.1 s).

Only when both read quiet does it launch `bench.py --scaling 4 16`, whose
own per-leg probe gate then decides whether SCALING.json is overwritten.
Exits 0 as soon as a run lands with quiet_legs=true; exits 2 when the
attempt/time budget is exhausted.  Run it alone — any concurrent compute
poisons both the sentinel and the legs.

    nohup python scripts/scaling_watch.py > /tmp/scaling_watch.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PROBE_MIN = 0.88          # of the 6,403 quiet reference
SENTINEL_MAX_SEC = 43.0   # canonical 16-cpu crawl 38.1 s; >~42 s = bad disk regime
POLL_SEC = 150            # VM weather oscillates on ~10-min timescales
MAX_LAUNCHES = 3
MAX_WALL_SEC = 100 * 60


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def probe_ratio() -> float:
    import bench

    return bench._probe16() / bench.QUIET_REF_PAGES_PER_SEC


def sentinel_sec() -> float:
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "measure_streamed.py"),
         "--cpus", "16", "--pages", "300000"],
        capture_output=True, text=True, cwd=REPO,
    )
    line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
    return float(json.loads(line)["sec"])


def main() -> int:
    t0 = time.time()
    launches = 0
    while time.time() - t0 < MAX_WALL_SEC and launches < MAX_LAUNCHES:
        r = probe_ratio()
        if r < PROBE_MIN:
            log(f"probe {r:.3f}x quiet < {PROBE_MIN} — waiting")
            time.sleep(POLL_SEC)
            continue
        s = sentinel_sec()
        if s > SENTINEL_MAX_SEC:
            log(f"probe {r:.3f}x OK but sentinel {s:.1f}s > {SENTINEL_MAX_SEC}s — waiting")
            time.sleep(POLL_SEC)
            continue
        log(f"QUIET window (probe {r:.3f}x, sentinel {s:.1f}s) — launching scaling 4 16")
        launches += 1
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--scaling", "4", "16"],
            capture_output=True, text=True, cwd=REPO,
        )
        lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not lines:
            log(f"scaling run produced no JSON (rc={p.returncode}); stderr tail: "
                + p.stderr[-300:])
            time.sleep(POLL_SEC)
            continue
        res = json.loads(lines[-1])
        log(f"attempt done: value={res.get('value')} quiet_legs={res.get('quiet_legs')} "
            f"probes={res.get('probe_before_legs')}+{res.get('probe_after_legs')}")
        if res.get("quiet_legs"):
            log("SCALING.json updated on a quiet run — done")
            return 0
        time.sleep(POLL_SEC)
    log("budget exhausted without a quiet-legs run")
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
