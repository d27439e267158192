#!/usr/bin/env python3
"""Per-query bench ratio scan (round-16 verdict #2's done-criterion).

Usage: python3 tools/bench_outliers.py <prev_bench.json> <new_bench.json> [threshold]

Compares the per-query best-of-reps walls ("mins" — less host-stall noise
than medians) between two bench artifacts over their COMMON query set,
computes each query's new/prev ratio and the median ratio (the round's
host-day drift), and flags any query whose ratio departs from that median
by more than `threshold` (default 1.5x) in either direction. A uniformity
sentence ("no query-specific regression outside xN") may only be written
when this scan prints no outliers — r16's DESIGN.md claim was falsified
by two 2x outliers its own artifact contained.

Exit code: 0 = no outliers, 1 = outliers found or common set shrank
(queries dropped from the new artifact), 2 = usage error.
"""
import json
import statistics
import sys


def main(prev_path, new_path, threshold=1.5):
    prev = json.load(open(prev_path))
    new = json.load(open(new_path))
    pmins, nmins = prev.get("mins", {}), new.get("mins", {})
    common = sorted(set(pmins) & set(nmins))
    if not common:
        print("no common queries between the two artifacts", file=sys.stderr)
        return 2
    ratios = {q: nmins[q] / pmins[q] for q in common if pmins[q] > 0}
    med = statistics.median(ratios.values())
    outliers = {q: r for q, r in ratios.items()
                if r > threshold * med or r < med / threshold}
    print(f"common queries: {len(common)}   median ratio: {med:.3f}   "
          f"threshold: {threshold}x of median")
    only_new = sorted(set(nmins) - set(pmins))
    if only_new:
        print(f"new-only queries (not compared): {', '.join(only_new)}")
    only_prev = sorted(set(pmins) - set(nmins))
    if only_prev:
        # A shrinking common set is itself a finding: a query that
        # vanished from the new artifact can hide a regression this scan
        # would otherwise flag (ADVICE round 17).
        print(f"PREV-ONLY queries (dropped from the new artifact): "
              f"{', '.join(only_prev)}")
    if outliers:
        print("OUTLIERS (investigate before writing any uniformity claim):")
        for q in sorted(outliers, key=lambda q: -abs(outliers[q] - med)):
            print(f"  {q}: {pmins[q]:.3f}s -> {nmins[q]:.3f}s "
                  f"(ratio {ratios[q]:.2f} vs median {med:.2f})")
        return 1
    print("no per-query outliers: every common query within "
          f"[{med/threshold:.2f}, {med*threshold:.2f}]x")
    # Dropped queries mean the "no outliers" verdict covers less than the
    # previous artifact did — refuse the clean exit.
    return 1 if only_prev else 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], t))
