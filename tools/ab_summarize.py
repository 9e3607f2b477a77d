#!/usr/bin/env python
"""Matched-epoch table for the cross-framework A/B (CORRECTNESS_r04).

Reads the torch arm's metrics.jsonl and any number of fvp arm train
logs/stdout captures, and prints a markdown table of mean AP / MPJPE@500
at matched epochs.

Usage:
  python tools/ab_summarize.py --torch /tmp/fvp_ab/torch_arm60/metrics.jsonl \
      --fvp tpu=/tmp/fvp_ab/fvp_arm60_tpu.out --fvp cpu=/tmp/fvp_ab/fvp_arm60.out \
      [--epochs 0,9,19,29,39,49,59]
"""

from __future__ import annotations

import argparse
import ast
import json
import re


def read_torch(path):
    rows = {}
    for line in open(path):
        d = json.loads(line)
        if "mean_ap" in d:
            rows[d["epoch"]] = (d["mean_ap"], d["mpjpe500"])
    return rows


def read_fvp(path):
    rows = {}
    for line in open(path):
        m = re.search(r"epoch (\d+) metrics: (\{.*\})", line)
        if not m:
            continue
        body = re.sub(r"np\.float64\(([^)]*)\)", r"\1", m.group(2))
        body = body.replace("inf", "float('inf')")
        try:
            d = eval(body, {"float": float})  # noqa: S307 — own logs
        except Exception:
            continue
        rows[int(m.group(1))] = (d["mean_ap"], d["mpjpe@500"])
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch", required=True)
    ap.add_argument("--fvp", action="append", default=[],
                    help="name=path (repeatable)")
    ap.add_argument("--epochs", default="")
    args = ap.parse_args()

    cols = [("reference-torch", read_torch(args.torch))]
    for spec in args.fvp:
        name, path = spec.split("=", 1)
        cols.append((f"fvp_tpu ({name})", read_fvp(path)))

    if args.epochs:
        epochs = [int(e) for e in args.epochs.split(",")]
    else:
        epochs = sorted(set().union(*[c.keys() for _, c in cols]))

    head = "| epoch | " + " | ".join(n for n, _ in cols) + " |"
    print(head)
    print("|" + "---|" * (len(cols) + 1))
    for e in epochs:
        cells = []
        for _, rows in cols:
            if e in rows:
                ap_, mp = rows[e]
                cells.append(f"{ap_:.3f} / {mp:.1f}")
            else:
                cells.append("—")
        print(f"| {e} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
