"""Physical-plan audit as part of the test suite (VERDICT r01 item 9:
"audit green in CI alongside pytest").

Runs tools/explain_audit.py in a subprocess (it owns its SparkSession and
exits non-zero on any failed plan assertion): column pruning, filter
pushdown, single-Exchange two-phase agg, broadcast joins, top-K-capped
lang-ID profile, lazy cosine pairs, broadcast semi-joins, rollup shape.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_explain_audit_passes():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "explain_audit.py")],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, f"plan audit failed:\n{proc.stdout}\n{proc.stderr}"
