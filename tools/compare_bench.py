#!/usr/bin/env python
"""Compare a bench capture against the pinned per-query baseline ledger.

Usage: python tools/compare_bench.py [CAPTURE] [BASELINE]
       (defaults: bench_full.json vs BASELINE_SF01.json)

The round-13 capture protocol (bench.py docstring): only captures with
probe_ok=true are comparable; this tool refuses noisy captures loudly.
Movers beyond the documented +-25% idle noise band are listed largest
first so a regression is attributable to a specific query, against a
FIXED baseline instead of last round's possibly-inflated file.
Queries absent from the baseline (new this round) are listed separately
— freeze them into the ledger once their first probe-accepted capture
exists (python tools/compare_bench.py --freeze adds them).

Ledger update policy (round 14, VERDICT r13 What's-wrong #2): the r13
wholesale re-freeze loosened 10 entries up to 1.21x, which a regression
ledger must never do.  `--freeze` stays ADD-ONLY (new queries only);
`--ratchet` updates existing entries via per-query min(old, new) from an
accepted capture and adds new queries — entries can only tighten.
Wholesale replacement is no longer supported.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NOISE = 1.25


def main() -> None:
    args = [a for a in sys.argv[1:]
            if a not in ("--freeze", "--ratchet")]
    freeze = "--freeze" in sys.argv
    ratchet = "--ratchet" in sys.argv
    cap_path = args[0] if args else os.path.join(HERE, "bench_full.json")
    base_path = (args[1] if len(args) > 1
                 else os.path.join(HERE, "BASELINE_SF01.json"))
    cap = json.load(open(cap_path))
    if not cap.get("probe_ok", False):
        print(f"REJECTED: {cap_path} has probe_ok="
              f"{cap.get('probe_ok')} (probe_ratio="
              f"{cap.get('probe_ratio')}) — the host speed shifted "
              "mid-capture; re-run bench.py on an idle box before "
              "comparing.")
        sys.exit(2)
    if not os.path.exists(base_path):
        if freeze:
            json.dump({"frozen_from": os.path.basename(cap_path),
                       "probe_ratio": cap.get("probe_ratio"),
                       # the freeze phase's probe numbers: future
                       # captures can compare their own probes against
                       # these to judge ABSOLUTE host-phase drift, not
                       # just mid-capture stability
                       "probe_before": cap.get("probe_before"),
                       "probe_after": cap.get("probe_after"),
                       "queries": cap["queries"]},
                      open(base_path, "w"), indent=1, sort_keys=True)
            print(f"froze {len(cap['queries'])} queries -> {base_path}")
            return
        print(f"no baseline at {base_path}; run with --freeze to pin "
              "this capture as the ledger")
        sys.exit(1)
    led = json.load(open(base_path))
    base = led["queries"]
    qs = cap["queries"]
    lp, cp = led.get("probe_before"), cap.get("probe_before")
    if lp and cp:
        phase = sum(cp.values()) / sum(lp.values())
        print(f"host phase vs freeze: {phase:.2f}x "
              "(probe totals; >1 = this capture ran on a slower "
              "phase — expect uniform inflation of that size)")
    movers, faster, new = [], [], []
    for name, t in qs.items():
        b = base.get(name)
        if b is None:
            new.append(name)
        elif b > 0 and t / b > NOISE:
            movers.append((t / b, name, b, t))
        elif t > 0 and b / t > NOISE:
            faster.append((b / t, name, b, t))
    movers.sort(reverse=True)
    faster.sort(reverse=True)
    common = [n for n in qs if n in base]
    tot_c = sum(qs[n] for n in common)
    tot_b = sum(base[n] for n in common)
    print(f"common {len(common)} queries: {tot_b:.1f}s pinned -> "
          f"{tot_c:.1f}s captured ({tot_c / tot_b:.2f}x), "
          f"probe_ratio {cap.get('probe_ratio')}")
    for r, name, b, t in movers:
        print(f"  SLOWER {r:.2f}x  {name}: {b:.2f}s -> {t:.2f}s")
    for r, name, b, t in faster:
        print(f"  faster {r:.2f}x  {name}: {b:.2f}s -> {t:.2f}s")
    if new:
        print(f"  new (not in ledger): {', '.join(sorted(new))}")
        if freeze or ratchet:
            led = json.load(open(base_path))
            led["queries"].update({n: qs[n] for n in new})
            json.dump(led, open(base_path, "w"), indent=1,
                      sort_keys=True)
            print(f"  froze {len(new)} new queries into the ledger")
    if ratchet:
        led = json.load(open(base_path))
        tightened = 0
        for name in common:
            if qs[name] < led["queries"][name]:
                led["queries"][name] = qs[name]
                tightened += 1
        json.dump(led, open(base_path, "w"), indent=1, sort_keys=True)
        print(f"  ratchet: tightened {tightened} of {len(common)} "
              "entries (per-query min; loosening impossible)")
    if not movers:
        print("no regressions beyond the noise band vs the pinned "
              "ledger")
    sys.exit(0 if not movers else 3)


if __name__ == "__main__":
    main()
