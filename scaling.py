#!/usr/bin/env python
"""Scaling-efficiency evidence (north rule: >=0.8 between N and 4N).

No real cluster exists in this sandbox, so per the driver instruction
the same job runs at two parallelism levels — local[N] and local[4N] —
on the SAME input, in fresh JVMs, and we report pages/sec at both plus
efficiency = (throughput_4N / throughput_N) / 4.

Methodology (round 2, tightened round 3):
* **CPU pinning**: each leg is `taskset`-pinned to exactly its core
  count (leg N -> cores 0..N-1, leg 4N -> cores 0..4N-1), so the JVM's
  availableProcessors, GC threads, and Python workers match the leg —
  the single-box analogue of an executor's resource envelope. The
  pinned range is exported so bench.py counts steal ONLY on those
  cores (a storm elsewhere no longer flags a clean trial).
* **Interleaved pairs**: legs run N,4N,N,4N,... so any external host
  load hits both levels equally.
* **Steal-clean accounting** (round-3): every leg carries an explicit
  `steal_clean` flag (selected trial's steal rate <= threshold).
  Polluted legs are EXCLUDED from selection whenever at least one
  clean leg exists on that side; the JSON carries `all_clean` so a
  storm-polluted headline can never masquerade as a clean one. The
  headline reports BOTH the min-of-clean-legs pair and the
  median-of-clean-legs pair (median is the robust one; min is the
  steady-state bound). CPU-parity / work-efficiency decomposition is
  computed ONLY from clean pairs (a steal-deflated CPU sample once
  produced an impossible >1 value).
* **Loadavg gate**: each leg waits for 1-min loadavg below a threshold
  before starting.
* **Compute-dominated input**: SPARK_GRAFT_ROUTES (default 50000 ->
  ~202k pages) keeps each leg's measured section long enough that
  fixed driver/JVM overhead is amortized.
* The pages parquet is pre-generated once at full parallelism, so the
  pinned legs measure the pipeline, not the generator.
* Results append to scaling_runs.md (a dedicated log), never into
  BENCH-SCALING.md's prose tables.

Usage: python scaling.py [n_routes]
Env: SPARK_GRAFT_SCALE_N (default 2), SPARK_GRAFT_SCALE_PAIRS (default 3),
     SPARK_GRAFT_LOADAVG_MAX (default 4.0),
     SPARK_GRAFT_STEAL_RATE_MAX (default 0.5 steal-s per wall-s).
"""

from __future__ import annotations

import json
import os
import statistics
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


def run_bench(
    cpus: int, routes: int, pin: bool = True,
    timeout_s: float | None = None, trials: int | None = None,
) -> dict | None:
    """One bench invocation; None on wall-timeout (a storm can stretch
    a pinned 2-core leg indefinitely — an unbounded leg would eat the
    whole measurement session, so a timed-out attempt counts as
    polluted and the leg moves on)."""
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_ROUTES"] = str(routes)
    env["SPARK_GRAFT_SKIP_SUITE"] = "1"
    if trials is not None:
        env["SPARK_GRAFT_GEO_TRIALS"] = str(trials)
        env["SPARK_GRAFT_MAX_TRIALS"] = str(trials)
    # 2 in-JVM trials + at most 1 pollution retry per invocation
    # (round-5 retune): the contention waves arrive minutes apart, so a
    # 3-trial nominal-450 s invocation straddles one and times out —
    # round 4 lost four sessions that way and round 5's first attempt
    # timed out the same way with a GO preflight 4 minutes earlier.
    # Shorter invocations fit between waves; cross-invocation retries
    # (run_leg) provide the extra samples instead.
    env.setdefault("SPARK_GRAFT_GEO_TRIALS", "2")
    env.setdefault("SPARK_GRAFT_MAX_TRIALS", "3")
    # capacity budget for the scaling legs: clean sessions measure
    # 0.85-1.6 ms CPU/page at 202k pages across 2-32 cores; the
    # documented steal-blind contention waves inflate that 3-5x. The
    # default 30 is sized for tiny suite inputs and would never flag
    # a degraded 202k-page leg.
    env.setdefault("SPARK_GRAFT_GEO_CPU_MS_PER_PAGE_MAX", "3.0")
    timeout = timeout_s if timeout_s is not None else float(
        os.environ.get("SPARK_GRAFT_LEG_TIMEOUT", "1200")
    )
    cmd = [sys.executable, os.path.join(HERE, "bench.py")]
    if pin:
        env["SPARK_GRAFT_PINNED_CPUS"] = f"0-{cpus - 1}"
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    try:
        out = subprocess.run(
            cmd, env=env, capture_output=True, text=True, check=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        print(f"[scaling] leg cpus={cpus} TIMED OUT after {timeout}s",
              file=sys.stderr, flush=True)
        return None
    return json.loads(out.stdout.strip().splitlines()[-1])


def _rate(r: dict) -> float:
    return r.get("geo_steal_sec", 0.0) / max(
        r["queries"]["geo_pipeline_pages"], 1e-9
    )


def run_leg(cpus: int, routes: int, max_load: float, steal_rate_max: float,
            retries: int = 2) -> dict:
    """One pinned leg, re-run (up to ``retries`` times) while even its
    BEST trial overlapped a hypervisor steal storm — measured on this
    host: a steal burst turns 6 CPU-s of work into 975 CPU-s of vCPU
    spinning, so a polluted trial measures the hypervisor, not the
    engine. Storm = steal RATE above ``steal_rate_max`` seconds of
    steal per wall second. The returned dict always carries
    ``steal_clean``: False means every attempt was polluted and the
    fastest polluted attempt is returned, EXPLICITLY marked."""
    retries = int(os.environ.get("SPARK_GRAFT_LEG_RETRIES", retries + 1))
    best = None
    for attempt in range(retries + 1):
        wait_for_quiet(max_load)
        r = run_bench(cpus, routes)
        if r is None:
            continue  # timed out mid-storm: counts as polluted
        print(
            f"[scaling] cpus={cpus} attempt={attempt} "
            f"wall={r['queries']['geo_pipeline_pages']}s "
            f"steal={r.get('geo_steal_sec')}s rate={_rate(r):.2f} "
            f"cpu={r.get('geo_cpu_sec')}s "
            f"capacity_clean={r.get('geo_capacity_clean')}",
            file=sys.stderr, flush=True,
        )
        if best is None or (
            r["queries"]["geo_pipeline_pages"]
            < best["queries"]["geo_pipeline_pages"]
        ):
            best = r
        # accept only FULLY clean (steal + capacity): a steal-clean
        # wave-degraded leg is recorded if it ends up best, but the leg
        # keeps retrying for a clean sample while budget remains
        if _rate(r) <= steal_rate_max and r.get("geo_capacity_clean", True):
            r["steal_clean"] = True
            return r
    if best is None:
        # every attempt timed out mid-storm: return None instead of
        # raising so the session keeps the pairs it already measured
        # (a crash here used to lose a 40-min session's output).
        print(
            f"[scaling] leg cpus={cpus} ABANDONED: every attempt timed "
            "out; host too stormy",
            file=sys.stderr, flush=True,
        )
        return None
    # exhausted retries: label honestly (a leg can be steal-clean yet
    # capacity-dirty — _fully_clean sees both flags independently)
    best["steal_clean"] = _rate(best) <= steal_rate_max
    return best


def _fully_clean(r: dict) -> bool:
    """Steal-clean AND capacity-clean: the round-5 canonical leg
    cleanliness (BENCH-SCALING.md "declared estimator"). Steal alone is
    blind to the measured shared-bandwidth waves that inflate CPU 3-5x
    with near-zero steal ticks; the CPU-per-page budget sees them."""
    return bool(r.get("steal_clean")) and bool(r.get("geo_capacity_clean", True))


def _select(legs: list[dict]) -> dict:
    """Min-wall leg among fully-clean legs; degrade to steal-clean,
    then to all, ONLY when the better pool is empty (every leg carries
    its flags, so a degraded selection can never masquerade)."""
    pool = [r for r in legs if _fully_clean(r)]
    if not pool:
        pool = [r for r in legs if r.get("steal_clean")]
    if not pool:
        pool = legs
    return min(pool, key=lambda r: r["queries"]["geo_pipeline_pages"])


def preflight(n: int, steal_rate_max: float) -> bool:
    """Cheap starvation-regime gate before committing to a ~40-minute
    session: one pinned N-core leg over a small input (nominal ~15-25 s
    at 2 cores). During the documented evening storm waves this leg
    inflates >3x or times out — bail in ~2 minutes instead of burning
    three 900 s timeouts per side (round-4 lost four sessions that way).
    """
    routes = int(os.environ.get("SPARK_GRAFT_PREFLIGHT_ROUTES", "8000"))
    budget = float(os.environ.get("SPARK_GRAFT_PREFLIGHT_MAX_SEC", "90"))
    env = dict(os.environ)
    env["SPARK_GRAFT_GEN_ONLY"] = "1"
    env["SPARK_GRAFT_ROUTES"] = str(routes)
    subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    r = run_bench(n, routes, timeout_s=budget * 2, trials=1)
    if r is None:
        print(f"[scaling] preflight: {n}-core probe TIMED OUT "
              f"({budget * 2:.0f}s) — starvation regime, aborting session",
              file=sys.stderr, flush=True)
        return False
    wall = r["queries"]["geo_pipeline_pages"]
    ok = wall <= budget and _rate(r) <= steal_rate_max
    print(f"[scaling] preflight: {n}-core {routes}-route probe "
          f"wall={wall}s cpu={r.get('geo_cpu_sec')}s "
          f"steal={r.get('geo_steal_sec')}s -> {'GO' if ok else 'NO-GO'}",
          file=sys.stderr, flush=True)
    return ok


def _median_t(legs: list[dict]) -> float | None:
    clean = [r["queries"]["geo_pipeline_pages"] for r in legs if _fully_clean(r)]
    return statistics.median(clean) if clean else None


def main():
    routes = int(sys.argv[1]) if len(sys.argv) > 1 else int(
        os.environ.get("SPARK_GRAFT_ROUTES", "50000")
    )
    n = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
    n4 = 4 * n
    pairs = int(os.environ.get("SPARK_GRAFT_SCALE_PAIRS", "3"))
    max_load = float(os.environ.get("SPARK_GRAFT_LOADAVG_MAX", "4.0"))
    steal_rate_max = float(os.environ.get("SPARK_GRAFT_STEAL_RATE_MAX", "0.5"))

    if not os.environ.get("SPARK_GRAFT_SKIP_PREFLIGHT"):
        if not preflight(n, steal_rate_max):
            return 2

    # pre-generate pages at full parallelism (unpinned)
    env = dict(os.environ)
    env["SPARK_GRAFT_GEN_ONLY"] = "1"
    env["SPARK_GRAFT_ROUTES"] = str(routes)
    subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )

    legs_N, legs_4N = [], []
    legs_path = os.path.join(HERE, "scaling_legs.jsonl")

    def _record(leg: dict | None, cores: int) -> None:
        # durable per-leg dump: a later crash/abandon can no longer lose
        # already-measured legs (they can be re-aggregated by hand).
        if leg is None:
            row = {"cores": cores, "abandoned": True}
        else:
            row = {
                "cores": cores,
                "wall": leg["queries"]["geo_pipeline_pages"],
                "cpu": leg.get("geo_cpu_sec"),
                "steal": leg.get("geo_steal_sec"),
                "clean": bool(leg.get("steal_clean")),
                "capacity_clean": bool(leg.get("geo_capacity_clean", True)),
                "pages": leg.get("pages"),
            }
        with open(legs_path, "a") as f:
            f.write(json.dumps(row) + "\n")

    for p in range(pairs):
        leg = run_leg(n, routes, max_load, steal_rate_max)
        _record(leg, n)
        if leg is not None:
            legs_N.append(leg)
        leg = run_leg(n4, routes, max_load, steal_rate_max)
        _record(leg, n4)
        if leg is not None:
            legs_4N.append(leg)

    if not legs_N or not legs_4N:
        print(
            "[scaling] session unusable: a whole side was abandoned "
            f"(N legs {len(legs_N)}, 4N legs {len(legs_4N)})",
            file=sys.stderr, flush=True,
        )
        return 1

    rN, r4N = _select(legs_N), _select(legs_4N)
    tN = rN["queries"]["geo_pipeline_pages"]
    t4N = r4N["queries"]["geo_pipeline_pages"]
    pages = rN["pages"]
    pN, p4N = pages / tN, pages / t4N
    eff = (p4N / pN) / 4.0
    medN, med4N = _median_t(legs_N), _median_t(legs_4N)
    eff_median = (
        round(((pages / med4N) / (pages / medN)) / 4.0, 3)
        if medN and med4N
        else None
    )
    all_clean = all(r.get("steal_clean") for r in legs_N + legs_4N)
    all_fully_clean = (
        len(legs_N) == pairs
        and len(legs_4N) == pairs
        and all(_fully_clean(r) for r in legs_N + legs_4N)
    )
    # CPU-parity decomposition: equal total CPU at both levels means the
    # engine does identical WORK regardless of parallelism — any wall-
    # clock efficiency shortfall is then core idleness, not extra
    # computation introduced by scaling out. Computed ONLY when both
    # selected legs are steal-clean: a steal-deflated CPU sample makes
    # the ratio meaningless (round-2 recorded an impossible 1.48).
    cN, c4N = rN.get("geo_cpu_sec"), r4N.get("geo_cpu_sec")
    both_clean = rN.get("steal_clean") and r4N.get("steal_clean")
    cpu_parity = (
        round(c4N / cN, 3) if (both_clean and cN and c4N) else None
    )
    work_eff = round(eff * cpu_parity, 3) if cpu_parity else None
    result = {
        "routes": routes,
        "pages": pages,
        "n_cores": n,
        "pairs": pairs,
        "pinned": True,
        "all_tN": [r["queries"]["geo_pipeline_pages"] for r in legs_N],
        "all_t4N": [r["queries"]["geo_pipeline_pages"] for r in legs_4N],
        "clean_N": [bool(r.get("steal_clean")) for r in legs_N],
        "clean_4N": [bool(r.get("steal_clean")) for r in legs_4N],
        "capacity_clean_N": [
            bool(r.get("geo_capacity_clean", True)) for r in legs_N
        ],
        "capacity_clean_4N": [
            bool(r.get("geo_capacity_clean", True)) for r in legs_4N
        ],
        "all_clean": all_clean,
        "all_fully_clean": all_fully_clean,
        "selected_clean_N": bool(rN.get("steal_clean")),
        "selected_clean_4N": bool(r4N.get("steal_clean")),
        "steal_sec_N": rN.get("geo_steal_sec"),
        "steal_sec_4N": r4N.get("geo_steal_sec"),
        "all_steal_N": [r.get("geo_steal_sec") for r in legs_N],
        "all_steal_4N": [r.get("geo_steal_sec") for r in legs_4N],
        "pages_per_sec_N": round(pN, 2),
        "pages_per_sec_4N": round(p4N, 2),
        "tN_sec": tN,
        "t4N_sec": t4N,
        "tN_median_clean": medN,
        "t4N_median_clean": med4N,
        "cpu_sec_N": cN,
        "cpu_sec_4N": c4N,
        "cpu_parity_4N_over_N": cpu_parity,
        "work_efficiency_cpu_adjusted": work_eff,
        "scaling_efficiency_4N_vs_N": round(eff, 3),
        "scaling_efficiency_median_clean": eff_median,
    }
    print(json.dumps(result))
    with open(os.path.join(HERE, "scaling_runs.md"), "a") as f:
        f.write(
            f"| {routes} | {pages} | local[{n}]: {pN:.1f} p/s | "
            f"local[{n4}]: {p4N:.1f} p/s | {tN:.1f}s | {t4N:.1f}s | "
            f"min-eff {eff:.3f} | median-eff {eff_median} | "
            f"clean N={result['clean_N']} 4N={result['clean_4N']} | "
            f"cpu {cN}s/{c4N}s parity {cpu_parity} | "
            f"steal {rN.get('geo_steal_sec')}s/{r4N.get('geo_steal_sec')}s |\n"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
