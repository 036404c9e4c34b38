"""Forced-spill end-to-end at suite scale (VERDICT r4 #7).

Drives tools/spill_scale.py in-process with budgets tiny enough that
both out-of-core branches MUST spill (300k pairs ~ 170 MB of sort
records vs an 8 MB budget; the count's host-table budget at 16 MB),
asserting the spilled archive is content-exact against the simulator's
own barcode assignment and the spilled count equals the in-memory one.
The 10M-pair scale numbers live in SPILL_r05.json (tools/spill_scale.py
at defaults); this test keeps the same code path green in the suite.
"""

import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spill_tool_forced_budgets(tmp_path):
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    import spill_scale

    report = str(tmp_path / "report.json")
    rc = spill_scale.main([
        "--pairs", "300000", "--count-pairs", "50000",
        "--sort-budget-mb", "8", "--count-budget-mb", "16",
        "--out", str(tmp_path / "lib"), "--report", report,
    ])
    assert rc == 0
    import json
    rep = json.load(open(report))
    assert rep["count_ab"]["equal"] is True
    assert rep["sort"]["verified_barcodes_content"] == 32
