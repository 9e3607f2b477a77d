#!/usr/bin/env python
"""Stall-supervised training: run the train CLI under a watchdog that
detects a wedged device link and restarts from the latest checkpoint.

Why: this machine's tunneled TPU link can wedge mid-run — a device fetch
never returns, the process sits alive but makes no progress
(CORRECTNESS_r02.md "Infrastructure finding"). The reference framework has
no analog because local CUDA doesn't fail this way; a production TPU
fleet absolutely does (preemptions, link flaps), so restart-from-
checkpoint supervision is a first-class subsystem here.

Mechanism:
  - spawns `run/train.py --cfg ... --save-every N [--resume]` in its own
    process group, logging to <out>/supervised_train.log
  - watches the log: if no new bytes for --stall-timeout seconds, sends
    SIGUSR1 (run/train.py faulthandler dumps all-thread stacks into the
    log for post-mortem), waits grace seconds, then kills the process
    GROUP (never by pattern) and relaunches with --resume
  - stops after --max-restarts consecutive no-progress restarts, or when
    the child exits 0

Usage:
  python tools/train_supervisor.py --cfg configs/test/synthetic_convergence.yaml \
      [--save-every 50] [--stall-timeout 300] [--max-restarts 5] [-- extra args]
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tail(path: str, n: int = 3) -> str:
    try:
        with open(path, "rb") as f:
            return b"\n".join(f.read().splitlines()[-n:]).decode(
                "utf-8", "replace")
    except OSError:
        return ""


def run_attempt(cmd: list[str], log_path: str, stall_timeout: float,
                grace: float,
                compile_timeout: float = 3600.0) -> tuple[int | None, bool]:
    """Run one training attempt. Returns (exit_code_or_None, made_progress):
    exit code None means we killed it for stalling.

    Two-phase stall detection: until the first training-step line appears
    (a "] loss" marker), the attempt is presumed to be COMPILING — remote
    compiles on this machine run 25+ min with zero log output, and a
    short timeout kills healthy runs (observed round 3). Once stepping,
    the steady-state `stall_timeout` applies (a wedged device fetch shows
    up as log silence within seconds of real time)."""
    with open(log_path, "ab") as log:
        log.write(f"\n=== supervisor: launching {' '.join(cmd)} ===\n"
                  .encode())
        log.flush()
        proc = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                                start_new_session=True, cwd=REPO)
    made_progress = False
    stepping = False
    last_size = os.path.getsize(log_path)
    last_change = time.monotonic()
    while True:
        rc = proc.poll()
        if rc is not None:
            return rc, made_progress
        time.sleep(5.0)
        size = os.path.getsize(log_path)
        if size != last_size:
            if not stepping:
                with open(log_path, "rb") as f:
                    f.seek(last_size)
                    if b"] loss" in f.read(size - last_size):
                        stepping = True
            last_size = size
            last_change = time.monotonic()
            made_progress = True
        elif (time.monotonic() - last_change
              > (stall_timeout if stepping else compile_timeout)):
            limit = stall_timeout if stepping else compile_timeout
            print(f"supervisor: no log progress for {limit:.0f}s "
                  f"— dumping stacks and restarting", flush=True)
            print(f"  last log lines:\n{tail(log_path)}", flush=True)
            try:
                os.kill(proc.pid, signal.SIGUSR1)   # faulthandler dump
                time.sleep(grace)
            except ProcessLookupError:
                pass
            try:
                # kill the exact process group we created (spawned
                # children included) — never by name/pattern
                os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait()
            return None, made_progress


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--save-every", type=int, default=50)
    parser.add_argument("--stall-timeout", type=float, default=300.0,
                        help="log-silence limit once training steps are "
                             "flowing")
    parser.add_argument("--compile-timeout", type=float, default=3600.0,
                        help="log-silence limit before the first step "
                             "line (remote compiles are silent for 25+ "
                             "min on this machine)")
    parser.add_argument("--grace", type=float, default=20.0)
    parser.add_argument("--max-restarts", type=int, default=5)
    parser.add_argument("--log", default=None)
    parser.add_argument("extra", nargs="*",
                        help="extra args forwarded to run/train.py")
    args = parser.parse_args()

    log_path = args.log or os.path.join("/tmp", "supervised_train.log")
    base = [sys.executable, os.path.join(REPO, "run", "train.py"),
            "--cfg", args.cfg, "--save-every", str(args.save_every),
            *args.extra]

    no_progress = 0
    attempt = 0
    resume = False
    while True:
        attempt += 1
        cmd = base + (["--resume"] if resume else [])
        print(f"supervisor: attempt {attempt}", flush=True)
        rc, progressed = run_attempt(cmd, log_path, args.stall_timeout,
                                     args.grace, args.compile_timeout)
        if rc == 0:
            print("supervisor: training completed", flush=True)
            return
        resume = True                  # anything after attempt 1 resumes
        if progressed:
            no_progress = 0
        else:
            no_progress += 1
            if no_progress > args.max_restarts:
                print(f"supervisor: {no_progress} consecutive attempts "
                      f"with zero progress — giving up", flush=True)
                sys.exit(1)
        if rc is not None:
            print(f"supervisor: child exited rc={rc}; restarting with "
                  f"--resume", flush=True)
            time.sleep(10.0)


if __name__ == "__main__":
    main()
