"""Summarize torch-oracle vs JAX accuracy logs into the head-to-head
table (FIXTURE_RESULTS.md).

Parses 'Run: NN, Epoch:' + 'eval:' lines from both pipelines' logs and
computes, per run, final-test-at-best-valid under two SYMMETRIC
selection rules:
  primary  — the reference's best-valid rule over all evals
  robust   — same, excluding each run's FIRST eval (epoch-0 valid can
             spike on the leaky use_val valid split and freeze
             best-valid at an untrained checkpoint; see CLAUDE.md r5)

python scripts/summarize_fixture_results.py <label> <log> [<log>...]
"""
import ast
import re
import sys

import numpy as np

EVAL_RE = re.compile(r"eval(?: MRR)?: (\(.*?\)|\{.*?\})(?: \(T_test|$|\s*$)")
RUN_RE = re.compile(r"Run: (\d+), Epoch: (\d+)")


def parse(path):
    """-> {metric: [[(v, t) per eval] per run]} (metric='MRR' for tuple
    logs)."""
    runs = {}
    cur = None
    for line in open(path, errors="replace"):
        m = RUN_RE.search(line)
        if m:
            cur = int(m.group(1))
            continue
        m = EVAL_RE.search(line)
        if not m or cur is None:
            continue
        try:
            val = ast.literal_eval(m.group(1))
        except (ValueError, SyntaxError):
            continue
        if isinstance(val, dict):
            for k, tup in val.items():
                runs.setdefault(k, {}).setdefault(cur, []).append(
                    (float(tup[1]), float(tup[2])))
        else:
            runs.setdefault("MRR", {}).setdefault(cur, []).append(
                (float(val[1]), float(val[2])))
    return {k: [np.array(v[r]) for r in sorted(v)]
            for k, v in runs.items()}


def select(evals, skip_first):
    e = evals[1:] if skip_first and len(evals) > 1 else evals
    i = int(e[:, 0].argmax())
    return e[i, 1]


def main():
    label = sys.argv[1]
    logs = sys.argv[2:]
    print(f"== {label} ==")
    for path in logs:
        data = parse(path)
        for metric in sorted(data):
            per_run = data[metric]
            prim = [select(e, False) * 100 for e in per_run]
            rob = [select(e, True) * 100 for e in per_run]
            print(f"{path} {metric}: "
                  f"primary {np.mean(prim):.2f}±{np.std(prim):.2f} "
                  f"{[f'{x:.2f}' for x in prim]} | "
                  f"robust {np.mean(rob):.2f}±{np.std(rob):.2f} "
                  f"{[f'{x:.2f}' for x in rob]} ({len(per_run)} runs)")


if __name__ == "__main__":
    main()
