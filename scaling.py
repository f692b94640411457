#!/usr/bin/env python
"""Scaling-efficiency evidence (north rule: >=0.8 between N and 4N).

No real cluster exists in this sandbox, so per the driver instruction
the same job runs at two parallelism levels — local[N] and local[4N] —
on the SAME input, in fresh JVMs, and we report pages/sec at both plus
efficiency = (throughput_4N / throughput_N) / 4.

Methodology (round 2, addressing the round-1 0.49 measurement):
* **CPU pinning**: each leg is `taskset`-pinned to exactly its core
  count (leg N -> cores 0..N-1, leg 4N -> cores 0..4N-1), so the JVM's
  availableProcessors, GC threads, and Python workers match the leg —
  the single-box analogue of an executor's resource envelope.
* **Interleaved pairs**: legs run N,4N,N,4N,... so any external host
  load hits both levels equally; the reported number is the min over
  pairs per leg (steady state), on top of min-of-3 in-JVM trials.
* **Loadavg gate**: each leg waits for 1-min loadavg below a threshold
  before starting (the sandbox host carries external load we don't
  control; round 1 recorded identical legs varying 59.5 <-> 207.6 s).
* **Compute-dominated input**: SPARK_GRAFT_ROUTES (default 50000 ->
  ~202k pages) keeps each leg's measured section long enough that
  fixed driver/JVM overhead is amortized (Amdahl at toy scale was
  round-1 confound #3).
* The pages parquet is pre-generated once at full parallelism, so the
  pinned legs measure the pipeline, not the generator.

Usage: python scaling.py [n_routes]
Env: SPARK_GRAFT_SCALE_N (default 2), SPARK_GRAFT_SCALE_PAIRS (default 2),
     SPARK_GRAFT_LOADAVG_MAX (default 4.0).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def wait_for_quiet(max_load: float, timeout_s: float = 900.0) -> float:
    t0 = time.time()
    while True:
        load1 = float(open("/proc/loadavg").read().split()[0])
        if load1 <= max_load or time.time() - t0 > timeout_s:
            return load1
        time.sleep(20)


def run_bench(cpus: int, routes: int, pin: bool = True) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_ROUTES"] = str(routes)
    env["SPARK_GRAFT_SKIP_SUITE"] = "1"
    env.setdefault("SPARK_GRAFT_GEO_TRIALS", "3")
    cmd = [sys.executable, os.path.join(HERE, "bench.py")]
    if pin:
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_leg(cpus: int, routes: int, max_load: float, steal_rate_max: float,
            retries: int = 2) -> dict:
    """One pinned leg, re-run (up to ``retries`` times) while even its
    BEST trial overlapped a hypervisor steal storm — measured on this
    host: a steal burst turns 6 CPU-s of work into 975 CPU-s of vCPU
    spinning, so a polluted trial measures the hypervisor, not the
    engine. Storm = steal RATE above ``steal_rate_max`` seconds of
    steal per wall second (the host's continuous background steal is
    ~0.1-0.2 s/s; storms hit ~1 s/s)."""
    best = None
    for _ in range(retries + 1):
        wait_for_quiet(max_load)
        r = run_bench(cpus, routes)
        if best is None or (
            r["queries"]["geo_pipeline_pages"]
            < best["queries"]["geo_pipeline_pages"]
        ):
            best = r
        rate = r.get("geo_steal_sec", 0.0) / max(
            r["queries"]["geo_pipeline_pages"], 1e-9
        )
        if rate <= steal_rate_max:
            return r
    return best


def main():
    routes = int(sys.argv[1]) if len(sys.argv) > 1 else int(
        os.environ.get("SPARK_GRAFT_ROUTES", "50000")
    )
    n = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
    n4 = 4 * n
    pairs = int(os.environ.get("SPARK_GRAFT_SCALE_PAIRS", "2"))
    max_load = float(os.environ.get("SPARK_GRAFT_LOADAVG_MAX", "4.0"))

    # pre-generate pages at full parallelism (unpinned)
    env = dict(os.environ)
    env["SPARK_GRAFT_GEN_ONLY"] = "1"
    env["SPARK_GRAFT_ROUTES"] = str(routes)
    subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )

    steal_rate_max = float(os.environ.get("SPARK_GRAFT_STEAL_RATE_MAX", "0.5"))
    legs_N, legs_4N = [], []
    for p in range(pairs):
        legs_N.append(run_leg(n, routes, max_load, steal_rate_max))
        legs_4N.append(run_leg(n4, routes, max_load, steal_rate_max))

    rN = min(legs_N, key=lambda r: r["queries"]["geo_pipeline_pages"])
    r4N = min(legs_4N, key=lambda r: r["queries"]["geo_pipeline_pages"])
    tN = rN["queries"]["geo_pipeline_pages"]
    t4N = r4N["queries"]["geo_pipeline_pages"]
    pN = rN["pages"] / tN
    p4N = r4N["pages"] / t4N
    eff = (p4N / pN) / 4.0
    # CPU-parity decomposition: equal total CPU at both levels means the
    # engine does identical WORK regardless of parallelism — any wall-
    # clock efficiency shortfall is then core idleness (scheduling,
    # stragglers, fixed serial sections, external host load), not extra
    # computation introduced by scaling out. cpu_parity = CPU_4N / CPU_N
    # (1.0 = perfect); work_eff is the efficiency the same job shows
    # once the measured CPU inflation is factored out.
    cN, c4N = rN.get("geo_cpu_sec"), r4N.get("geo_cpu_sec")
    cpu_parity = round(c4N / cN, 3) if cN and c4N else None
    work_eff = round(eff * cpu_parity, 3) if cpu_parity else None
    result = {
        "routes": routes,
        "pages": rN["pages"],
        "n_cores": n,
        "pairs": pairs,
        "pinned": True,
        "all_tN": [r["queries"]["geo_pipeline_pages"] for r in legs_N],
        "all_t4N": [r["queries"]["geo_pipeline_pages"] for r in legs_4N],
        "steal_sec_N": rN.get("geo_steal_sec"),
        "steal_sec_4N": r4N.get("geo_steal_sec"),
        "all_steal_N": [r.get("geo_steal_sec") for r in legs_N],
        "all_steal_4N": [r.get("geo_steal_sec") for r in legs_4N],
        "pages_per_sec_N": round(pN, 2),
        "pages_per_sec_4N": round(p4N, 2),
        "tN_sec": tN,
        "t4N_sec": t4N,
        "cpu_sec_N": cN,
        "cpu_sec_4N": c4N,
        "cpu_parity_4N_over_N": cpu_parity,
        "work_efficiency_cpu_adjusted": work_eff,
        "scaling_efficiency_4N_vs_N": round(eff, 3),
    }
    print(json.dumps(result))
    with open(os.path.join(HERE, "BENCH-SCALING.md"), "a") as f:
        f.write(
            f"\n| {routes} | {rN['pages']} | local[{n}] pinned: {pN:.1f} | "
            f"local[{n4}] pinned: {p4N:.1f} | {tN:.1f}s | {t4N:.1f}s | {eff:.3f} |"
            f" cpu {cN}s vs {c4N}s (parity {cpu_parity}), "
            f"steal {rN.get('geo_steal_sec')}s/{r4N.get('geo_steal_sec')}s |"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
