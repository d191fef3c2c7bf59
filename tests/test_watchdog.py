"""Watchdog supervisor: stall detection, kill, cooldown, relaunch, crash
retry (scripts/watchdog.py — the auto-relaunch half of failure recovery;
checkpoint auto-resume is the other half, tested via scripts/train.py)."""

import os
import subprocess
import sys
import textwrap

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WATCHDOG = os.path.join(ROOT, "scripts", "watchdog.py")


def _run(args, timeout=120):
    return subprocess.run(
        [sys.executable, WATCHDOG] + args,
        capture_output=True, text=True, timeout=timeout,
    )


def _child_script(tmp_path, body):
    p = tmp_path / "child.py"
    p.write_text(textwrap.dedent(body))
    return str(p)


def test_clean_exit_passes_through(tmp_path):
    progress = tmp_path / "progress.txt"
    child = _child_script(tmp_path, f"""
        open({str(progress)!r}, "w").write("done")
    """)
    r = _run(["--file", str(progress), "--stall-seconds", "60",
              "--cooldown", "0", "--", sys.executable, child])
    assert r.returncode == 0
    assert "finished cleanly" in r.stdout


def test_stall_is_killed_and_relaunched_resume_completes(tmp_path):
    """First run writes progress then freezes (never touches the file
    again); watchdog kills it, relaunches; second run sees the marker and
    exits 0 — the auto-resume pattern."""
    progress = tmp_path / "progress.txt"
    marker = tmp_path / "attempt2"
    child = _child_script(tmp_path, f"""
        import os, sys, time
        if os.path.exists({str(marker)!r}):
            sys.exit(0)                      # 'resumed' run completes
        open({str(marker)!r}, "w").write("x")
        open({str(progress)!r}, "w").write("step 0")
        time.sleep(3600)                     # wedge: alive, no progress
    """)
    r = _run(["--file", str(progress), "--stall-seconds", "3",
              "--startup-grace", "3", "--cooldown", "0", "--poll", "0.5",
              "--", sys.executable, child])
    assert r.returncode == 0, r.stdout + r.stderr
    assert "STALL" in r.stdout
    assert "finished cleanly" in r.stdout


def test_crash_is_retried_then_gives_up(tmp_path):
    progress = tmp_path / "progress.txt"
    child = _child_script(tmp_path, """
        import sys
        sys.exit(3)
    """)
    r = _run(["--file", str(progress), "--stall-seconds", "60",
              "--cooldown", "0", "--max-restarts", "2",
              "--", sys.executable, child])
    assert r.returncode == 3  # documented contract: the child's exit code
    assert r.stdout.count("exited rc=3") == 3  # initial + 2 retries
    assert "giving up" in r.stdout


def test_cold_compile_grace_not_killed(tmp_path):
    """A child that is silent for longer than --stall-seconds but within
    --startup-grace (cold-cache compile) must NOT be killed."""
    progress = tmp_path / "progress.txt"
    child = _child_script(tmp_path, f"""
        import time
        time.sleep(4)                        # 'compiling': > stall budget
        open({str(progress)!r}, "w").write("step 0")
    """)
    r = _run(["--file", str(progress), "--stall-seconds", "1",
              "--startup-grace", "30", "--cooldown", "0", "--poll", "0.5",
              "--", sys.executable, child])
    assert r.returncode == 0
    assert "STALL" not in r.stdout
