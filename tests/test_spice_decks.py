"""The committed SPICE oracle decks stay structurally valid.

tools/run_spice.py executes them when ngspice exists; here (no ngspice
in CI) the structural lint must pass for every committed deck — this is
what caught the full-chain deck corruption (values renamed as nodes)."""

import glob
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_deck_count_and_lint():
    decks = sorted(glob.glob(os.path.join(REPO, "spice", "*.cir")))
    # reference ships 30 testbenches + 3 melange netlists; ours: 33 tb
    # roles + 3 netlists = 36
    assert len(decks) >= 30, f"only {len(decks)} decks committed"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_spice.py"),
         "--lint-only"],
        capture_output=True, text=True, cwd=REPO, timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "0 failures" in proc.stdout, proc.stdout
