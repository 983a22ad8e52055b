#!/usr/bin/env python
"""Batched scaling-efficiency evidence (round-4 re-measurement).

The r3 spot-check (BENCH/scaling_r3_spotcheck.json) measured raw 0.549 /
ceiling-relative 0.78 from ONE batch per level — below the 0.8 north-rule
line, and the verdict flagged the claim as unevidenced until a banded
re-measurement lands.  This harness runs B alternated batches; each batch
is (ALU-ceiling calibration, local[N] level, local[4N] level) back-to-back
so every efficiency ratio is computed from CONTEMPORANEOUS samples — a
multi-minute hypervisor-steal burst then poisons one batch, not one whole
level, and the band across batches shows whether a low number is weather
or code.

Per batch b:
  raw_eff[b]    = (min_small[b] / min_big[b]) / (N_BIG / N_SMALL)
  alu_eff[b]    = same-batch embarrassingly-parallel ceiling (registers
                  only, independent processes, zero coordination — the
                  highest any software can scale on this host)
  engine_eff[b] = raw_eff[b] / alu_eff[b]

Reported: per-batch table + min/median/max band for all three series.
Writes BENCH/scaling_batched.json and appends the band to BENCH/BASELINE.md
(via run_scaling.py's writer inputs saved as phase files).

Usage: python scripts/run_scaling_batched.py [n_batches]
Resumable: each (batch, phase) result is cached under BENCH/batch_<b>_*.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
OUT_DIR = os.path.join(REPO, "BENCH")

import run_scaling as rs  # noqa: E402


def _cached(tag: str, fn):
    path = os.path.join(OUT_DIR, f"batch_{tag}.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    out = fn()
    with open(path, "w") as f:
        json.dump(out, f)
    return out


def run_level_repl(cpus: int, repl: str) -> dict:
    """run_level with a per-level REPL override (weak-scaling mode: the
    input grows with the core count, the truer N -> 4N cluster story —
    efficiency = thr_big / (ratio * thr_small) = T_small / T_big when the
    doc ratio equals the core ratio)."""
    saved = rs.REPL
    rs.REPL = repl
    try:
        return rs.run_level(cpus)
    finally:
        rs.REPL = saved


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    weak = "--weak" in sys.argv
    ratio = rs.N_BIG / rs.N_SMALL

    batches = []
    for b in range(n_batches):
        print(f"[batched] === batch {b} ===", file=sys.stderr, flush=True)
        # cache tag carries the level pair when it isn't the default 8->32,
        # so an N=4->16 series can't collide with the primary series' files
        lv = "" if (rs.N_SMALL, rs.N_BIG) == (8, 32) else f"n{rs.N_SMALL}x{rs.N_BIG}_"
        tag = f"{lv}w{b}" if weak else f"{lv}{b}"
        alu = _cached(f"{tag}_alu", lambda: rs.hw_ceiling(rs._burn_alu))
        if weak:
            small_repl = str(int(int(rs.REPL) / ratio))
            small = _cached(
                f"{tag}_small", lambda: run_level_repl(rs.N_SMALL, small_repl)
            )
            big = _cached(f"{tag}_big", lambda: rs.run_level(rs.N_BIG))
            raw = small["min_sec"] / big["min_sec"]
        else:
            small = _cached(f"{tag}_small", lambda: rs.run_level(rs.N_SMALL))
            big = _cached(f"{tag}_big", lambda: rs.run_level(rs.N_BIG))
            raw = (small["min_sec"] / big["min_sec"]) / ratio
        eng = raw / alu["throughput_eff"]
        batches.append(
            {
                "batch": b,
                "alu_eff": alu["throughput_eff"],
                "runs_small": small["times"],
                "runs_big": big["times"],
                "min_small_sec": small["min_sec"],
                "min_big_sec": big["min_sec"],
                "raw_eff": round(raw, 3),
                "engine_eff": round(eng, 3),
                "docs_per_sec_small": small["docs_per_sec"],
                "docs_per_sec_big": big["docs_per_sec"],
                "n_docs": small["n_docs"],
            }
        )
        print(f"[batched] batch {b}: {batches[-1]}", file=sys.stderr, flush=True)

    def band(key):
        vals = sorted(x[key] for x in batches)
        return {
            "min": vals[0],
            "median": round(statistics.median(vals), 3),
            "max": vals[-1],
        }

    # Cross-batch best-sustained: min over ALL samples at each level — the
    # steady-state estimator once enough batches exist that at least one
    # small and one big window were quiet.
    all_small = min(t for x in batches for t in x["runs_small"])
    all_big = min(t for x in batches for t in x["runs_big"])
    # weak mode: the input already grows with the core count, so raw
    # efficiency is the plain time ratio (dividing by the core ratio again
    # would double-count it)
    best_raw = round(
        (all_small / all_big) if weak else (all_small / all_big) / ratio, 3
    )
    best_alu = max(x["alu_eff"] for x in batches)
    result = {
        "protocol": (
            f"{n_batches} alternated batches of (ALU ceiling, local[{rs.N_SMALL}], "
            f"local[{rs.N_BIG}]); taskset-pinned, fresh plan per run, JIT-converged "
            f"warmup per level; per-batch efficiency from contemporaneous samples"
        ),
        "n_small": rs.N_SMALL,
        "n_big": rs.N_BIG,
        "repl": int(rs.REPL),
        "n_docs": batches[0]["n_docs"],
        "batches": batches,
        "band_raw_eff": band("raw_eff"),
        "band_alu_eff": band("alu_eff"),
        "band_engine_eff": band("engine_eff"),
        "best_sustained_raw_eff": best_raw,
        "best_alu_eff": best_alu,
        "best_engine_eff": round(best_raw / best_alu, 3),
    }
    lv_out = "" if (rs.N_SMALL, rs.N_BIG) == (8, 32) else f"_n{rs.N_SMALL}x{rs.N_BIG}"
    wk_out = "_weak" if weak else ""
    with open(os.path.join(OUT_DIR, f"scaling_batched{lv_out}{wk_out}.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
