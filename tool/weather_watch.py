#!/usr/bin/env python
"""Healthy-weather auto-capture for the two eval recaptures that keep
landing under a degraded relay (VERDICT r04 item 4).

Keeps ONE jax client alive and probes the relay every few minutes with
the same 6 MB upload probe the captures use. When a probe clears the
40 MB/s healthy floor (and no foreground job holds /tmp/fg_busy), fires
the pending ``tool/perf_report.py`` sections one at a time; a capture
counts as landed when its emitted PERF_RECORD.jsonl row has
``n_healthy >= 2`` (the capture's own scoring threshold). Exits when
every target has landed or after --max-hours.

Usage: nohup python tool/weather_watch.py > /tmp/weather_watch.log 2>&1 &
"""
import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(ROOT, "PERF_RECORD.jsonl")
BUSY_SENTINEL = "/tmp/fg_busy"  # foreground jobs touch this to pause firing

# perf_report section -> the metric name its row is emitted under
TARGETS = {
    "eval_psa": "eval_ss_cityscapes_psanet50_705",
    "eval": "eval_ss_ade20k_shapes_pspnet50_bucketed",
}


def _landed(metric):
    """True once the ledger holds a healthy capture for ``metric``."""
    if not os.path.exists(LEDGER):
        return False
    with open(LEDGER) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("metric") == metric and rec.get("n_healthy", 0) >= 2:
                return True
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--floor", type=float,
                    default=float(os.environ.get("PERF_LINK_FLOOR_MB_S", 40)))
    ap.add_argument("--period-s", type=float, default=240)
    ap.add_argument("--max-hours", type=float, default=10)
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(ROOT, "tool"))
    from perf_report import _make_link_probe  # keeps one client alive

    probe = _make_link_probe()
    deadline = time.time() + args.max_hours * 3600
    while time.time() < deadline:
        pending = [s for s, m in TARGETS.items() if not _landed(m)]
        if not pending:
            print("all targets landed healthy; exiting", flush=True)
            return 0
        mbps = probe()
        stamp = time.strftime("%H:%M:%S")
        if mbps < args.floor:
            print(f"{stamp} {mbps} MB/s (floor {args.floor}); "
                  f"pending={pending}", flush=True)
        elif os.path.exists(BUSY_SENTINEL):
            print(f"{stamp} {mbps} MB/s HEALTHY but fg_busy; holding",
                  flush=True)
        else:
            section = pending[0]
            print(f"{stamp} {mbps} MB/s HEALTHY -> firing {section}",
                  flush=True)
            r = subprocess.run(
                [sys.executable, os.path.join(ROOT, "tool", "perf_report.py"),
                 section],
                cwd=ROOT, timeout=3 * 3600,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
            tail = r.stdout.decode(errors="replace").strip().splitlines()
            print(f"  {section} rc={r.returncode}; "
                  + "; ".join(tail[-2:]), flush=True)
            continue  # re-probe immediately: maybe fire the next target
        time.sleep(args.period_s)
    print("max-hours reached; exiting", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
