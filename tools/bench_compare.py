#!/usr/bin/env python3
"""Round-over-round + run-over-run bench comparison.

Usage: python3 tools/bench_compare.py <runA.json> <runB.json> [baseline.json]

Prints per-entry warm times for the two runs of the two-run protocol,
their quieter (min) combination, and — when a baseline (e.g. the prior
round's committed bench_out.json) is given — the entries whose warm
regresses more than 2x vs the baseline in BOTH runs (the signal the
protocol exists to separate from single-run noise).

The streaming family gets the same two-run treatment on its OWN metric
(stream_per_batch_sec): per-entry per-batch deltas between the runs and
vs the baseline, so a state/commit regression moves a dedicated number
instead of hiding under fixed trigger overhead (round-12 verdict item 7).
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d.get("warm", {}), d


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    wa, da = load(sys.argv[1])
    wb, db = load(sys.argv[2])
    base, base_full = load(sys.argv[3]) if len(sys.argv) > 3 else (None, {})

    common = sorted(set(wa) & set(wb))
    print(f"entries: runA={len(wa)} runB={len(wb)} common={len(common)}")
    ta = sum(v for k, v in wa.items() if k in common and v >= 0)
    tb = sum(v for k, v in wb.items() if k in common and v >= 0)
    print(f"common warm total: runA={ta:.1f}s runB={tb:.1f}s "
          f"(noisy A={da.get('noisy')}, B={db.get('noisy')})")

    if base:
        shared = [k for k in common if k in base and base[k] > 0]
        tbase = sum(base[k] for k in shared)
        tmin = sum(min(wa[k], wb[k]) for k in shared)
        print(f"vs baseline ({len(shared)} shared): baseline={tbase:.1f}s "
              f"min-of-two={tmin:.1f}s ({100*(tmin-tbase)/tbase:+.1f}%)")
        print("\nentries >2x baseline in BOTH runs (the bisect list):")
        hits = 0
        for k in shared:
            if wa[k] > 2 * base[k] + 0.2 and wb[k] > 2 * base[k] + 0.2:
                print(f"  {k}: base={base[k]:.2f} runA={wa[k]:.2f} "
                      f"runB={wb[k]:.2f}")
                hits += 1
        if not hits:
            print("  (none)")
        print("\nentries >1.5x baseline in both runs (watch list):")
        for k in shared:
            if (1.5 * base[k] + 0.1 < wa[k] <= 2 * base[k] + 0.2 or
                1.5 * base[k] + 0.1 < wb[k] <= 2 * base[k] + 0.2) and \
               wa[k] > 1.5 * base[k] + 0.1 and wb[k] > 1.5 * base[k] + 0.1:
                print(f"  {k}: base={base[k]:.2f} runA={wa[k]:.2f} "
                      f"runB={wb[k]:.2f}")
        print("\nbiggest improvements vs baseline (min-of-two):")
        gains = sorted(shared, key=lambda k: min(wa[k], wb[k]) - base[k])[:8]
        for k in gains:
            print(f"  {k}: base={base[k]:.2f} -> {min(wa[k], wb[k]):.2f}")

    # streaming family: per-batch two-run comparison
    pa = da.get("stream_per_batch_sec", {}) or {}
    pb = db.get("stream_per_batch_sec", {}) or {}
    pbase = (base_full.get("stream_per_batch_sec", {}) or {}) \
        if base is not None else {}
    skeys = sorted(set(pa) & set(pb))
    if skeys:
        print("\nstream per-batch (two runs, min, vs baseline):")
        for k in skeys:
            lo = min(pa[k], pb[k])
            b = pbase.get(k)
            # `b is not None`: a 0.00 baseline is a real (fast) baseline,
            # not a missing one; regression flags only when BOTH runs
            # exceed the bar (the two-run protocol — one slow run is noise)
            tail = (f" base={b:.2f} ({'+' if lo > b else ''}"
                    f"{100*(lo-b)/b:.0f}%)") if b else ""
            flag = " <<" if b is not None and \
                pa[k] > 1.5 * b + 0.1 and pb[k] > 1.5 * b + 0.1 else ""
            print(f"  {k}: runA={pa[k]:.2f} runB={pb[k]:.2f} "
                  f"min={lo:.2f}{tail}{flag}")


if __name__ == "__main__":
    main()
