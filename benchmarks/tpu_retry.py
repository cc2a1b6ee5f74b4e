#!/usr/bin/env python
"""Stall-aware TPU job runner.

The tunneled TPU backend intermittently hangs at init (first jax op
blocks forever; CLAUDE.md).  This wrapper starts the command, requires
SOME stdout/stderr output within --init-window seconds (backends that
came up always log something), kills and retries otherwise, and also
enforces a hard per-attempt timeout.

Usage: python benchmarks/tpu_retry.py --init-window 240 --timeout 2400 \
           --attempts 3 -- python benchmarks/acceptance.py f ...
"""
import argparse
import os
import signal
import subprocess
import sys
import threading
import time


def run_once(cmd, init_window, hard_timeout):
    t0 = time.time()
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True,
                            preexec_fn=os.setsid)
    last_out = [time.time()]
    got_any = [False]

    def pump():
        for line in proc.stdout:
            last_out[0] = time.time()
            # boilerplate emitted BEFORE the backend connects must not
            # satisfy the init-window (the axon plugin warns at import,
            # then the first device op can still hang forever)
            if "is experimental" not in line and line.strip():
                got_any[0] = True
            sys.stdout.write(line)
            sys.stdout.flush()

    th = threading.Thread(target=pump, daemon=True)
    th.start()
    while proc.poll() is None:
        time.sleep(5)
        now = time.time()
        if not got_any[0] and now - t0 > init_window:
            print(f"[tpu_retry] no output after {init_window}s — "
                  "backend init hang, killing", flush=True)
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait()
            return "stalled"
        if now - t0 > hard_timeout:
            print(f"[tpu_retry] hard timeout {hard_timeout}s", flush=True)
            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait()
            return "timeout"
    th.join(timeout=10)
    return proc.returncode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--init-window", type=int, default=240)
    ap.add_argument("--timeout", type=int, default=3600)
    ap.add_argument("--attempts", type=int, default=3)
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    for i in range(args.attempts):
        rc = run_once(cmd, args.init_window, args.timeout)
        if rc == 0:
            sys.exit(0)
        print(f"[tpu_retry] attempt {i + 1} -> {rc}; retrying in 20 s",
              flush=True)
        time.sleep(20)
    sys.exit(1)


if __name__ == "__main__":
    main()
