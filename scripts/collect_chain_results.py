"""Collect the round-5 production CLI-chain scores into the repo.

Reads /tmp/chain_<variant>_scores/summary.json for each scored variant
(exact / int8 / dpm20 / dpm15 / dpm10 / dpm20_int8 — the hardware
protocol run by scripts/round5_queue{,2,3}.sh: cli.pred_rollout 20
members x 240 h x 4 init times -> cli.evaluate_ens decode+scoring,
the TPU equivalent of the reference's evaluate/evaluate_ens_gpu.py
protocol, reference README.md:124-149), copies the raw summaries into
results/round5_chain/, and prints two markdown tables for
PERFORMANCE.md:

  1. per-variable day-1/5/10 RMSE for exact, with relative deltas for
     each fast variant;
  2. same for CRPS.

Also pulls per-init rollout wall seconds from /tmp/r5_chain_<v>.log.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re
import shutil
import sys

VARIANTS = ["exact", "int8", "dpm20", "dpm15", "dpm10", "dpm20_int8"]
REPO = pathlib.Path(__file__).resolve().parent.parent
OUT = REPO / "results" / "round5_chain"
ROOT = pathlib.Path("/tmp")


def load(variant: str):
    p = ROOT / f"chain_{variant}_scores/summary.json"
    if not p.exists():
        return None
    return json.loads(p.read_text())


def chain_walls(variant: str):
    log = ROOT / f"r5_chain_{variant}.log"
    if not log.exists():
        return []
    walls = []
    for line in log.read_text().splitlines():
        m = re.search(r'"seconds": ([0-9.]+)', line)
        if m:
            walls.append(float(m.group(1)))
    return walls


def main():
    # --variants/--out let a later hardware run (e.g. the dpm15/dpm10
    # NFE-frontier chains, which retrain the rehearsal checkpoint and so
    # need their OWN exact baseline) land in a separate results dir
    # without overwriting the committed round5_chain tables.
    global VARIANTS, OUT, ROOT
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=",".join(VARIANTS),
                    help="comma-separated variant names; 'exact' required")
    ap.add_argument("--out", default=str(OUT),
                    help="results dir to copy summaries into")
    ap.add_argument("--scores_root", default=str(ROOT),
                    help="dir holding chain_<v>_scores/ + r5_chain_<v>.log")
    args = ap.parse_args()
    VARIANTS = [v for v in args.variants.split(",") if v]
    OUT = pathlib.Path(args.out)
    ROOT = pathlib.Path(args.scores_root)
    OUT.mkdir(parents=True, exist_ok=True)
    data = {}
    for v in VARIANTS:
        s = load(v)
        if s is None:
            print(f"[skip] {v}: no summary yet", file=sys.stderr)
            continue
        data[v] = s
        shutil.copy(ROOT / f"chain_{v}_scores/summary.json", OUT / f"{v}.json")
        walls = chain_walls(v)
        if walls:
            (OUT / f"{v}_rollout_walls.json").write_text(
                json.dumps({"per_init_s": walls}) + "\n"
            )
    if "exact" not in data:
        print("exact summary missing -- tables need the baseline", file=sys.stderr)
        return 1

    exact = data["exact"]
    fast = [v for v in VARIANTS[1:] if v in data]
    # evaluate_ens emits {"final": ...} instead of day keys when the
    # scored lead budget is under a day; use whichever lead labels the
    # exact summary actually carries, and only score variables every
    # variant shares (a variant scored with a narrower --variables list
    # must not crash the table for the rest).
    variables = [
        var for var in exact
        if all(var in data[v] for v in fast)
    ]
    first_var = next(iter(exact.values()), {})
    days = [d for d in ("day1", "day5", "day10") if d in first_var] or list(
        first_var.keys()
    )
    day_label = "/".join(days)

    for metric in ("rmse", "crps"):
        print(f"\n### {metric.upper()} (physical units; {day_label})\n")
        hdr = "| variable | exact " + "".join(
            f"| {v} Δ% " for v in fast
        ) + "|"
        print(hdr)
        print("|---" * (2 + len(fast)) + "|")
        for var in variables:
            e = exact[var]
            cells = ["/".join(f"{e[d][metric]:.4g}" for d in days)]
            for v in fast:
                f = data[v][var]
                deltas = []
                for d in days:
                    base = e[d][metric]
                    deltas.append(
                        100.0 * (f[d][metric] - base) / base if base else 0.0
                    )
                cells.append("/".join(f"{x:+.2f}" for x in deltas))
            print(f"| {var} | " + " | ".join(cells) + " |")

    print("\n### Rollout wall clock per init (s; first includes compile)\n")
    print("| variant | per-init wall (s) |")
    print("|---|---|")
    for v in VARIANTS:
        walls = chain_walls(v)
        if walls:
            print(f"| {v} | " + ", ".join(f"{w:.1f}" for w in walls) + " |")

    # Mean relative deltas across all variables/days for a one-line verdict.
    print()
    for v in fast:
        for metric in ("rmse", "crps"):
            rel = []
            for var in variables:
                for d in days:
                    base = exact[var][d][metric]
                    if base:
                        rel.append((data[v][var][d][metric] - base) / base)
            if rel:
                print(
                    f"{v} mean {metric} delta vs exact: "
                    f"{100.0 * sum(rel) / len(rel):+.3f} %"
                )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
