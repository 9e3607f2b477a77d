#!/usr/bin/env python
"""Summarize a training run directory: per-epoch eval metrics from the
train log(s) + best epoch, as a compact table for CORRECTNESS reports.

Usage: python tools/summarize_run.py /tmp/fvp_conv_r3/synthetic_convergence_r3
"""

from __future__ import annotations

import ast
import glob
import re
import sys


def parse_logs(run_dir: str):
    rows = []
    for path in sorted(glob.glob(f"{run_dir}/train_*.log")):
        for line in open(path):
            m = re.search(r"epoch (\d+) metrics: (\{.*\})", line)
            if not m:
                continue
            # the dict contains np.float64(...) wrappers; strip them
            body = re.sub(r"np\.float64\(([^)]*)\)", r"\1", m.group(2))
            try:
                d = ast.literal_eval(body)
            except (ValueError, SyntaxError):
                continue
            rows.append((int(m.group(1)), d))
    # keep the LAST occurrence per epoch (restarts re-log an epoch)
    out: dict[int, dict] = {}
    for e, d in rows:
        out[e] = d
    return dict(sorted(out.items()))


def main():
    run_dir = sys.argv[1]
    rows = parse_logs(run_dir)
    if not rows:
        print("no epoch metrics found")
        return
    print(f"{'epoch':>5} {'AP25':>7} {'AP50':>7} {'meanAP':>7} "
          f"{'recall':>7} {'MPJPE':>8}")
    best = None
    for e, d in rows.items():
        ap = d.get("ap", {})
        print(f"{e:>5} {ap.get(25, 0):7.3f} {ap.get(50, 0):7.3f} "
              f"{d.get('mean_ap', 0):7.3f} {d.get('recall@500', 0):7.3f} "
              f"{d.get('mpjpe@500', float('inf')):8.2f}")
        if best is None or d.get("mean_ap", 0) > best[1].get("mean_ap", 0):
            best = (e, d)
    e, d = best
    print(f"\nbest epoch {e}: mean AP {d['mean_ap']:.4f}, "
          f"AP25 {d['ap'][25]:.4f}, MPJPE {d['mpjpe@500']:.2f} mm, "
          f"recall {d['recall@500']:.4f}")


if __name__ == "__main__":
    main()
