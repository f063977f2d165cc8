"""The SURVEY.md §2 totals line must match the live registry.

Round 6 shipped a hand-typed off-by-one (474 vs 473 keys); this pins the
line to the machine-derived counts so it cannot drift again.
"""

import subprocess
import sys
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_survey_totals_match_registry():
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "inventory.py"), "--check"],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
