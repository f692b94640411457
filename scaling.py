#!/usr/bin/env python
"""Scaling-efficiency evidence (north rule: >=0.8 between N and 4N).

No real cluster exists in this sandbox, so per the driver instruction
the same job runs at two parallelism levels — local[8] (N) and
local[32] (4N) — on the SAME input, in fresh JVMs, and we report
pages/sec at both plus efficiency = (throughput_4N / throughput_N) / 4.

The input is sized compute-dominated (SPARK_GRAFT_ROUTES, default
20000 routes = ~3.6M nodes / ~80k pages) so the measurement reflects
the parallel fraction, not constant driver/JVM overhead. Results are
appended to BENCH-SCALING.md.

Usage: python scaling.py [n_routes]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_bench(cpus: int, routes: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_ROUTES"] = str(routes)
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    routes = int(sys.argv[1]) if len(sys.argv) > 1 else int(
        os.environ.get("SPARK_GRAFT_ROUTES", "20000")
    )
    # warm the pages cache in a throwaway run? bench generates on miss —
    # generate via first run; report uses its own timing fields only.
    r8 = run_bench(8, routes)
    r32 = run_bench(32, routes)
    t8 = r8["queries"]["geo_pipeline_pages"]
    t32 = r32["queries"]["geo_pipeline_pages"]
    p8 = r8["pages"] / t8
    p32 = r32["pages"] / t32
    eff = (p32 / p8) / 4.0
    result = {
        "routes": routes,
        "pages": r8["pages"],
        "pages_per_sec_local8": round(p8, 2),
        "pages_per_sec_local32": round(p32, 2),
        "t8_sec": t8,
        "t32_sec": t32,
        "scaling_efficiency_4N_vs_N": round(eff, 3),
    }
    print(json.dumps(result))
    with open(os.path.join(HERE, "BENCH-SCALING.md"), "a") as f:
        f.write(
            f"\n| {routes} | {r8['pages']} | {p8:.1f} | {p32:.1f} | "
            f"{t8:.1f}s | {t32:.1f}s | {eff:.3f} |"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
