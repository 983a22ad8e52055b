#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so the N -> 4N executor criterion is
evidenced by running the identical bench job at two parallelism levels on
the same input — local[8] vs local[32] on this 32-core host — and reporting
throughput at both plus efficiency = (T_8 / T_32) / 4.

Writes BENCH/scaling.json and BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")
OUT_DIR = os.path.join(REPO, "BENCH")

N_SMALL = int(os.environ.get("SPARK_GRAFT_N_SMALL", "8"))
N_BIG = int(os.environ.get("SPARK_GRAFT_N_BIG", "32"))


def run_bench(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, BENCH], env=env, capture_output=True, text=True, timeout=3600
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    small = run_bench(N_SMALL)
    big = run_bench(N_BIG)

    ratio = N_BIG / N_SMALL
    per_q = {}
    for q in small["queries"]:
        t_s, t_b = small["queries"][q], big["queries"][q]
        per_q[q] = {
            "t_small": t_s,
            "t_big": t_b,
            "speedup": round(t_s / t_b, 3),
            "efficiency": round((t_s / t_b) / ratio, 3),
        }
    eff_total = round((small["value"] / big["value"]) / ratio, 3)
    result = {
        "n_small": N_SMALL,
        "n_big": N_BIG,
        "input": small["sf"],
        "repl": small["repl"],
        "n_docs": small["n_docs"],
        "total_small_sec": small["value"],
        "total_big_sec": big["value"],
        "docs_per_sec_small": small["docs_per_sec"],
        "docs_per_sec_big": big["docs_per_sec"],
        "scaling_efficiency_total": eff_total,
        "queries": per_q,
    }
    with open(os.path.join(OUT_DIR, "scaling.json"), "w") as f:
        json.dump(result, f, indent=2)

    lines = [
        "# BENCH/BASELINE — scaling evidence (north_rule)",
        "",
        f"Same job, same input ({small['sf']}, docs x{small['repl']} = "
        f"{small['n_docs']} docs), two parallelism levels on one 32-core host.",
        f"Efficiency = (T_{N_SMALL} / T_{N_BIG}) / {ratio:g}; target >= 0.8.",
        "",
        "| run | parallelism | total (s) | flagship docs/sec |",
        "|---|---|---|---|",
        f"| bench-N | local[{N_SMALL}] | {small['value']} | {small['docs_per_sec']} |",
        f"| bench-4N | local[{N_BIG}] | {big['value']} | {big['docs_per_sec']} |",
        "",
        f"**Total-suite scaling efficiency: {eff_total}**",
        "",
        "| query | T_N (s) | T_4N (s) | speedup | efficiency |",
        "|---|---|---|---|---|",
    ]
    for q, d in per_q.items():
        lines.append(
            f"| {q} | {d['t_small']} | {d['t_big']} | {d['speedup']} | {d['efficiency']} |"
        )
    with open(os.path.join(OUT_DIR, "BASELINE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
