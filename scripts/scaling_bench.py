"""Scaling-efficiency evidence (north_rule: >= 0.8 throughput scaling
from N to 4N executors; sandbox: same job at local[8] vs local[32] on
the same input).

Runs `bench.py --er-only` in fresh subprocesses (one JVM per
parallelism level), parses the JSON line, computes
efficiency = (T_N / T_4N) / 4 on the ER wall (prepare+block+score+
cluster; corpus generation excluded) and writes BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import date

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cores: int, entities: int, trials: int = 1) -> dict:
    """Best-of-N trials (min ER wall): this box shows ±30% run-to-run
    variance (shared host); the minimum approximates the true cost
    absent interference, applied identically to both levels."""
    best = None
    for _ in range(trials):
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = str(cores)
        env["EMBER_BENCH_ENTITIES"] = str(entities)
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--er-only"],
            capture_output=True,
            text=True,
            env=env,
            cwd=REPO,
            timeout=3600,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        if best is None or r["queries"]["er_total"] < best["queries"]["er_total"]:
            best = r
    return best


def main() -> None:
    entities = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    trials = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    r_lo = run_level(lo, entities, trials)
    r_hi = run_level(hi, entities, trials)
    t_lo = r_lo["queries"]["er_total"]
    t_hi = r_hi["queries"]["er_total"]
    pairs = r_hi["detail"]["scored_pairs"]
    thr_lo = pairs / t_lo
    thr_hi = pairs / t_hi
    speedup = t_lo / t_hi
    eff = speedup / (hi / lo)
    result = {
        "entities": entities,
        "docs": r_hi["detail"]["docs"],
        "scored_pairs": pairs,
        f"local[{lo}]": {"er_total_sec": t_lo, "pairs_per_sec": round(thr_lo, 1),
                         "stages": {k: v for k, v in r_lo["queries"].items()}},
        f"local[{hi}]": {"er_total_sec": t_hi, "pairs_per_sec": round(thr_hi, 1),
                         "stages": {k: v for k, v in r_hi["queries"].items()}},
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result, indent=2))

    md = f"""# BENCH — scaling-efficiency evidence ({date.today().isoformat()})

north_rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
executors. No real cluster exists in this sandbox, so the same ER job
(prepare -> block -> score -> cluster over the same deterministic
synthetic corpus, seed 142) runs at two parallelism levels in separate
JVMs; corpus generation and Spark startup are excluded from the timed
window.

| | local[{lo}] | local[{hi}] |
|---|---|---|
| ER wall (s) | {t_lo} | {t_hi} |
| candidate pairs scored | {pairs} | {pairs} |
| pairs/sec | {round(thr_lo, 1)} | {round(thr_hi, 1)} |

- input: {result["docs"]} synthetic pages ({entities} entities, seed 142)
- speedup {lo}->{hi} cores: **{round(speedup, 3)}x** (ideal 4x)
- **scaling efficiency: {round(eff, 3)}** (target >= 0.8)

Stage timings (seconds):

| stage | local[{lo}] | local[{hi}] |
|---|---|---|
"""
    for k in ["er_prepare", "er_block", "er_score", "er_cluster", "er_total"]:
        md += f"| {k} | {r_lo['queries'][k]} | {r_hi['queries'][k]} |\n"
    md += "\nReproduce: `python scripts/scaling_bench.py [entities]`\n"
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)
    print("wrote BENCH.md")


if __name__ == "__main__":
    main()
