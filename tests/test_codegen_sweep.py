"""CI gate for silent whole-stage-codegen compile failures (VERDICT r06
#5): execute EVERY contract entry at sf0.001 in a subprocess with stderr
captured and assert zero "Failed to compile" log lines. Janino failures
don't affect correctness — Spark falls back to interpreted execution
with only an ERROR log — but cost ~3-6x per call, so they must fail CI,
not hide in a manual grep."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"


def test_no_codegen_compile_failures():
    if not os.path.isdir(SF_DIR):
        import pytest
        pytest.skip(f"{SF_DIR} not present")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "codegen_sweep.py"),
         SF_DIR],
        # 2400 s: the sequential sweep measured 651 s solo on a slow
        # 32-core VM and timed out at 1200 s when run under suite load —
        # the sweep is now 4-way concurrent (~3x), but keep hang-guard
        # headroom for slower/contended hosts
        capture_output=True, text=True, timeout=2400, cwd=REPO)
    assert "SWEEP_DONE" in p.stdout, (
        f"sweep did not finish:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")
    entry_errors = [ln for ln in p.stdout.splitlines()
                    if ln.startswith("ENTRY_ERROR")]
    assert p.returncode == 0 and not entry_errors, entry_errors[:5]
    # the sweep logs one ERROR through the same log4j2 sink the codegen
    # fallback uses; requiring it here proves the grep below is looking
    # at a live log stream, not a misrouted/levelled-out one
    assert "CODEGEN_SWEEP_STDERR_SENTINEL" in p.stderr, (
        "JVM ERROR logs did not reach captured stderr — the compile-"
        "failure grep below would be vacuous")
    compile_fails = [ln for ln in p.stderr.splitlines()
                     if "Failed to compile" in ln]
    assert not compile_fails, (
        f"{len(compile_fails)} codegen compile failure(s); first: "
        f"{compile_fails[0][:300]}")
