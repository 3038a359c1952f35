"""Tests for tools/train_supervised.py — the packaged long-run restart loop
(EX_TEMPFAIL contract of train/trainer.py's RSS guard + wedge probe)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUPERVISOR = os.path.join(REPO, "tools", "train_supervised.py")


def _run(args, extra_env=None):
    env = dict(os.environ)
    env.update(extra_env or {})
    return subprocess.run(
        [sys.executable, SUPERVISOR, *args],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
    )


def test_clean_exit_passes_through():
    out = _run(["--", sys.executable, "-c", "print('trained'); raise SystemExit(0)"])
    assert out.returncode == 0
    assert "done" in out.stdout


def test_tempfail_restarts_until_done(tmp_path):
    # exits 75 twice (checkpointed restart points), then 0 — the supervisor
    # must relaunch every time without spending the crash budget.
    marker = tmp_path / "count"
    script = (
        "import os, sys;"
        f"p = {str(marker)!r};"
        "n = int(open(p).read()) if os.path.exists(p) else 0;"
        "open(p, 'w').write(str(n + 1));"
        "sys.exit(75 if n < 2 else 0)"
    )
    # Probe with a stub interpreter that always succeeds instantly (the real
    # probe imports jax — irrelevant to the restart logic under test).
    shim = tmp_path / "shim.py"
    shim.write_text("#!/usr/bin/env python\nimport sys\nprint('probe-ok')\n")
    wrapper = tmp_path / "fakepython"
    wrapper.write_text(
        f"#!/bin/sh\nexec {sys.executable} {shim} \"$@\"\n"
    )
    wrapper.chmod(0o755)
    out = _run(
        [
            "--probe-interval", "0.1",
            "--python", str(wrapper),
            "--", sys.executable, "-c", script,
        ]
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert marker.read_text() == "3"
    assert out.stdout.count("EX_TEMPFAIL") == 2


def test_crash_budget_exhausts(tmp_path):
    shim = tmp_path / "shim.py"
    shim.write_text("print('probe-ok')\n")
    wrapper = tmp_path / "fakepython"
    wrapper.write_text(f"#!/bin/sh\nexec {sys.executable} {shim} \"$@\"\n")
    wrapper.chmod(0o755)
    out = _run(
        [
            "--max-restarts", "1",
            "--probe-interval", "0.1",
            "--python", str(wrapper),
            "--", sys.executable, "-c", "raise SystemExit(3)",
        ]
    )
    assert out.returncode == 3
    assert "giving up" in out.stdout


def test_no_command_errors():
    out = _run(["--"])
    assert out.returncode != 0
