"""The round-5 chain-results collector: table math + artifact copies.

The collector turns the hardware CLI-chain score summaries
(/tmp/chain_<variant>_scores/summary.json, produced by
cli.evaluate_ens) into the PERFORMANCE.md markdown tables and copies
the raw summaries into results/. Pin its delta math, lead-label
handling, wall-clock extraction, and the --variants/--out/--scores_root
plumbing added for the NFE-frontier rerun.
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SCRIPT = REPO / "scripts" / "collect_chain_results.py"


def _summary(rmse: float, crps: float) -> dict:
    return {
        "geopotential@500": {
            d: {"rmse": rmse, "crps": crps} for d in ("day1", "day5", "day10")
        }
    }


def _run(tmp: Path, variants: str):
    return subprocess.run(
        [sys.executable, str(SCRIPT), "--variants", variants,
         "--out", str(tmp / "out"), "--scores_root", str(tmp)],
        capture_output=True, text=True,
    )


def test_collector_tables_and_copies(tmp_path):
    (tmp_path / "chain_exact_scores").mkdir()
    (tmp_path / "chain_exact_scores" / "summary.json").write_text(
        json.dumps(_summary(100.0, 50.0))
    )
    (tmp_path / "chain_dpm15_scores").mkdir()
    (tmp_path / "chain_dpm15_scores" / "summary.json").write_text(
        json.dumps(_summary(101.0, 49.5))
    )
    (tmp_path / "r5_chain_exact.log").write_text(
        'x {"seconds": 210.94} y\nz {"seconds": 31.89}\n'
    )

    r = _run(tmp_path, "exact,dpm15,dpm10")
    assert r.returncode == 0, r.stderr
    # dpm10 has no summary: skipped, not fatal
    assert "[skip] dpm10" in r.stderr
    # +1% RMSE and -1% CRPS deltas vs exact
    assert "+1.00/+1.00/+1.00" in r.stdout
    assert "-1.00/-1.00/-1.00" in r.stdout
    assert "dpm15 mean rmse delta vs exact: +1.000 %" in r.stdout
    # wall-clock extraction from the rollout log
    assert "210.9, 31.9" in r.stdout
    # raw summaries copied into --out
    out = tmp_path / "out"
    assert json.loads((out / "exact.json").read_text()) == _summary(100.0, 50.0)
    assert json.loads((out / "dpm15.json").read_text()) == _summary(101.0, 49.5)
    assert json.loads(
        (out / "exact_rollout_walls.json").read_text()
    ) == {"per_init_s": [210.94, 31.89]}


def test_collector_requires_exact_baseline(tmp_path):
    (tmp_path / "chain_dpm15_scores").mkdir()
    (tmp_path / "chain_dpm15_scores" / "summary.json").write_text(
        json.dumps(_summary(101.0, 49.5))
    )
    r = _run(tmp_path, "exact,dpm15")
    assert r.returncode == 1
    assert "exact summary missing" in r.stderr
