"""Smoke-run the example pipeline end to end on CPU (tiny shapes).

The examples are user-facing entry points; a broken import or API drift
there should fail CI, not a user.
"""

import runpy
import sys
from pathlib import Path


def test_pipeline_smoke(capsys, monkeypatch):
    root = Path(__file__).resolve().parent.parent
    monkeypatch.setattr(sys, "argv", [
        "pipeline.py", "--n", "4000", "--d", "32", "--m", "8",
        "--bits", "4", "--iters", "3", "--queries", "4",
        "--ivf", "16", "--virtual",
    ])
    runpy.run_path(str(root / "examples" / "pipeline.py"), run_name="__main__")
    out = capsys.readouterr().out
    assert "recall@10 of the planted nearest neighbor:" in out
    assert "virtual: search + exact-refine recall@10:" in out
    # Tiny-scale runs must still find their planted neighbors.
    for line in out.splitlines():
        if "recall@10" in line:
            assert float(line.rsplit(" ", 1)[1]) >= 0.75, line
