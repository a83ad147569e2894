"""PARITY.md's count block must match the live registry (r11 verdict #2/#5).

scripts/parity_counts.py owns the numbers; this test runs its --check mode
so a query registration without a doc regeneration fails CI instead of
drifting silently for a round.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parity_counts_current():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "parity_counts.py"), "--check"],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_ledger_freshness():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "ledger_check.py")],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
