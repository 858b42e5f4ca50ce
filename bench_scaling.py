#!/usr/bin/env python
"""Throughput-scaling evidence for the north rule: run the identical
extraction job at two parallelism levels (local[8] = N, local[32] = 4N —
the sandbox stand-in for N vs 4N executors) on the same synthetic
corpus, report both throughputs and the scaling efficiency
  eff = (tput_4N / tput_N) / 4         (target ≥ 0.8)

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.abspath(__file__))
N_DOCS = int(os.environ.get("SCALING_DOCS", "30000"))


def run_at(cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_ONLY="extract_fixture",
        BENCH_FIXTURE_DOCS=str(N_DOCS),
        BENCH_REPEAT=os.environ.get("BENCH_REPEAT", "3"),
        BENCH_PIN_CPUS="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    lo, hi = 8, 32
    r_lo = run_at(lo)
    r_hi = run_at(hi)
    t_lo = r_lo["docs_per_sec"]
    t_hi = r_hi["docs_per_sec"]
    eff = (t_hi / t_lo) / (hi / lo)
    result = {
        "metric": "scaling_efficiency_N_to_4N",
        "value": round(eff, 3),
        "unit": "ratio",
        "docs": N_DOCS,
        f"docs_per_sec_local{lo}": t_lo,
        f"docs_per_sec_local{hi}": t_hi,
        f"sec_local{lo}": r_lo["queries"]["extract_fixture"],
        f"sec_local{hi}": r_hi["queries"]["extract_fixture"],
    }
    print(json.dumps(result), flush=True)

    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    with open(os.path.join(ROOT, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH — measured scaling evidence

Identical extraction job (`extract(documents_df(spark, {N_DOCS}))`,
synthetic interleaved corpus incl. 1% media-heavy skew tail) at two
parallelism levels on the same machine — the sandbox stand-in for N vs
4N executor clusters (BASELINE.json north_rule).

| parallelism | wall sec | docs/sec |
|---|---|---|
| local[{lo}] (N) | {r_lo['queries']['extract_fixture']} | {t_lo} |
| local[{hi}] (4N) | {r_hi['queries']['extract_fixture']} | {t_hi} |

**Scaling efficiency (tput_4N / tput_N) / 4 = {eff:.3f}** (target ≥ 0.8)

Method: each run is a fresh JVM (`python bench.py`, BENCH_ONLY=
extract_fixture); the job includes the full pipeline — distributed corpus
generation, explode, boilerplate classify, the salted media repartition,
mapInPandas detect+recognize kernels, and grouped span assembly — forced
with a noop-format write (no driver collect).
"""
        )


if __name__ == "__main__":
    main()
