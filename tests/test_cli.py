"""CLI surface smoke tests (subprocess — the real user entry point)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args):
    return subprocess.run(
        [sys.executable, "-m", "novelti_dingo_spark", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )


def test_cli_list():
    r = _run("list")
    assert r.returncode == 0
    assert "q1_pricing_summary" in r.stdout
    assert "[oracle" in r.stdout and "[rows-only" in r.stdout


def test_cli_unknown_query_fails_cleanly():
    r = _run("run", "no_such_query")
    assert r.returncode == 2
    assert "unknown query" in r.stderr
