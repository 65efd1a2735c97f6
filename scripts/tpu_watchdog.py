"""Stall-detecting supervisor for long TPU jobs on the tunneled backend.

The axon-tunneled chip has three observed failure modes (see bench.py's
supervisor): mid-run worker crashes, init-time errors, and init-time HANGS
where jax.devices() blocks indefinitely with no exception.  bench.py guards
its own 20-minute measurement; training runs (quality_multiscene arms,
quality_overfit) run for hours and need the same protection or one bad
tunnel window silently eats a whole session.

This runner watches a PROGRESS FILE (typically the run's metrics.jsonl):

  * phase 1 (init): the file must APPEAR within --init_stall seconds
    (covers backend init + the first train-step compile; a backend hang
    never produces it);
  * phase 2 (train): the file's mtime must advance every --stall seconds.

On stall the child's whole process group is killed and the command retried
(up to --retries), optionally with --resume_args appended from the first
retry on (e.g. --resume_last, so a restart continues from the last
checkpoint instead of step 0).

Usage:
  python scripts/tpu_watchdog.py --progress runs/exp/logs/metrics.jsonl \
      [--init_stall 900] [--stall 600] [--retries 4] \
      [--resume_args --resume_last] -- python scripts/quality_multiscene.py ...
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def _mtime(path):
    """mtime of a file, or the newest entry of a directory (e.g. watch a
    test_meshes/ dir during an eval stage, where per-scene outputs land
    every minute or two but no single file keeps updating)."""
    try:
        if os.path.isdir(path):
            times = [os.path.getmtime(path)]
            for name in os.listdir(path):
                try:
                    times.append(os.path.getmtime(os.path.join(path, name)))
                except OSError:
                    pass
            return max(times)
        return os.path.getmtime(path)
    except OSError:
        return None


def run_once(cmd, progress, init_stall, stall, poll):
    """One supervised attempt.  Returns (rc or None-if-stalled, reason)."""
    proc = subprocess.Popen(cmd, start_new_session=True)
    start = time.time()
    last = _mtime(progress)
    last_change = start
    try:
        while True:
            rc = proc.poll()
            if rc is not None:
                return rc, f"exited rc={rc}"
            now = time.time()
            cur = _mtime(progress)
            if cur != last:
                last, last_change = cur, now
            if last is None and now - start > init_stall:
                return None, (
                    f"no progress file {progress} after {init_stall:.0f}s "
                    "(backend init hang?)"
                )
            if last is not None and now - last_change > stall:
                return None, (
                    f"progress file stale for {stall:.0f}s "
                    "(worker hang mid-run?)"
                )
            time.sleep(poll)
    finally:
        if proc.poll() is None:
            # kill the whole process group: the trainer may have spawned
            # loader threads / orbax helpers that would otherwise hold the
            # tunnel session open and poison the retry
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--progress", required=True,
                   help="file whose existence+mtime proves forward progress "
                   "(e.g. the run's logs/metrics.jsonl)")
    p.add_argument("--init_stall", type=float, default=900,
                   help="seconds allowed before the progress file first "
                   "appears (backend init + first compile)")
    p.add_argument("--stall", type=float, default=600,
                   help="seconds of unchanged mtime that count as a hang")
    p.add_argument("--retries", type=int, default=4)
    p.add_argument("--sleep", type=float, default=30,
                   help="pause between retries (worker recovery window)")
    p.add_argument("--poll", type=float, default=10)
    p.add_argument("--resume_args", nargs="*", default=[],
                   help="extra args appended to the command from the FIRST "
                   "retry on (e.g. --resume_last)")
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="-- command to supervise")
    args = p.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        p.error("no command given (pass it after --)")

    for attempt in range(args.retries + 1):
        full = cmd + (args.resume_args if attempt > 0 else [])
        sys.stderr.write(
            f"tpu_watchdog: attempt {attempt + 1}/{args.retries + 1}: "
            f"{' '.join(full)}\n"
        )
        sys.stderr.flush()
        rc, reason = run_once(
            full, args.progress, args.init_stall, args.stall, args.poll
        )
        if rc == 0:
            sys.stderr.write("tpu_watchdog: success\n")
            return 0
        sys.stderr.write(f"tpu_watchdog: attempt failed: {reason}\n")
        sys.stderr.flush()
        if attempt < args.retries:
            time.sleep(args.sleep)
    sys.stderr.write("tpu_watchdog: all attempts failed\n")
    return 1


if __name__ == "__main__":
    sys.exit(main())
