"""Matched-budget comparison table across long_run JSONL records.

The round-5 twin/three-way protocol (BASELINE.md "12k matched-budget
twins", "Grouped VQ at scale"): arms share corpus, seed, and step budget;
we compare (a) best holdout recon CE and the step it lands on, (b) the
mean over the late third of eval points (plateau robustness), and (c) the
free-running quality probes (spectral log-mel L2, teacher/free NLL) at
every matched probe step.

Usage:
    python scripts/compare_runs.py LABEL=path.jsonl [LABEL=path.jsonl ...]
    python scripts/compare_runs.py --max-step 6000 g1=a.jsonl g4=b.jsonl
"""

from __future__ import annotations

import argparse
import json


def load(path: str, max_step: int) -> dict:
    evals, quality = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            step = r.get("step")
            if step is None or step > max_step:
                continue
            if r.get("eval_split") == "holdout" and "eval_recon_ce" in r:
                evals.append((step, r["eval_recon_ce"]))
            if "quality_holdout" in r:
                q = r["quality_holdout"]
                quality.append((step, q))
    return {"evals": sorted(evals), "quality": sorted(quality)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+", help="LABEL=path.jsonl")
    ap.add_argument("--max-step", type=int, default=10**9)
    args = ap.parse_args()

    arms = {}
    for spec in args.runs:
        label, _, path = spec.partition("=")
        if not path:
            label, path = spec, spec
        arms[label] = load(path, args.max_step)

    print(f"{'arm':<12} {'best CE':>9} {'@step':>7} {'late-mean CE':>13} {'n_eval':>7}")
    for label, d in arms.items():
        ev = d["evals"]
        if not ev:
            print(f"{label:<12} (no holdout evals <= max-step)")
            continue
        best_step, best = min(ev, key=lambda t: t[1])
        late = [ce for _, ce in ev[-max(1, len(ev) // 3):]]
        print(f"{label:<12} {best:>9.4f} {best_step:>7} "
              f"{sum(late) / len(late):>13.4f} {len(ev):>7}")

    steps = sorted({s for d in arms.values() for s, _ in d["quality"]})
    if steps:
        print(f"\nquality probes (spectral_l2 | teacher_nll | free_nll):")
        header = "step".ljust(8) + "".join(l.ljust(26) for l in arms)
        print(header)
        for s in steps:
            row = f"{s:<8}"
            for d in arms.values():
                q = dict(d["quality"]).get(s)
                cell = (f"{q['spectral_l2']:.1f} | {q['teacher_nll']:.3f} | "
                        f"{q['free_nll']:.1f}" if q else "-")
                row += cell.ljust(26)
            print(row)


if __name__ == "__main__":
    main()
