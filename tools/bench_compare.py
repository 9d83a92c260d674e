#!/usr/bin/env python3
"""Mechanical cross-round bench comparison (VERDICT r12 item 7).

Usage: bench_compare.py OLD.json NEW.json [--threshold 1.25] [--abs-floor 0.15]

Takes two bench artifacts (graft.Bench output lines / bench/full_rN.json),
normalizes the NEW run's per-query times by the host-speed canary ratio when
BOTH artifacts carry `host_canary_sec` (the SCALING.md rule: divide new times
by canary_new/canary_old before suspecting a code regression), and reports:

  - totals (raw and normalized) and the canary ratio;
  - per-query drifts beyond --threshold (ratio, after normalization) that
    also exceed --abs-floor seconds of absolute change (sub-150 ms queries
    jitter by scheduling noise — a 2x drift on 40 ms is not a finding);
  - queries present in only one artifact (surface changes);
  - a reminder of the next escalation step (same-day worktree replay) when
    drifts survive normalization.

Exit code: 0 when no query survives the drift filter, 1 otherwise — usable
as a regression tripwire in a round's closing checklist.
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.readline())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.25,
                    help="normalized ratio beyond which a drift is flagged (default 1.25, both directions)")
    ap.add_argument("--abs-floor", type=float, default=0.15,
                    help="minimum absolute delta in seconds for a flag (default 0.15)")
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    oq, nq = old["queries"], new["queries"]

    oc, nc = old.get("host_canary_sec"), new.get("host_canary_sec")
    if oc and nc:
        ratio = nc / oc
        print(f"canary: old={oc:.3f}s new={nc:.3f}s ratio={ratio:.3f} "
              f"(new host is {'slower' if ratio > 1 else 'faster'}; normalizing new times by /{ratio:.3f})")
    else:
        ratio = 1.0
        missing = [n for n, c in (("old", oc), ("new", nc)) if not c]
        print(f"canary: missing in {', '.join(missing)} artifact(s) — RAW comparison only "
              f"(host drift up to ~1.8x has been measured between rounds; treat drifts as suspect)")

    shared = sorted(set(oq) & set(nq))
    only_old, only_new = sorted(set(oq) - set(nq)), sorted(set(nq) - set(oq))
    o_tot = sum(oq[k] for k in shared)
    n_tot_raw = sum(nq[k] for k in shared)
    n_tot = n_tot_raw / ratio
    print(f"totals over {len(shared)} shared queries: old={o_tot:.1f}s "
          f"new_raw={n_tot_raw:.1f}s new_normalized={n_tot:.1f}s "
          f"({(n_tot / o_tot - 1) * 100:+.1f}% normalized)")
    if only_old:
        print(f"only in old ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"only in new ({len(only_new)}): {', '.join(only_new)}")

    flagged = []
    for k in shared:
        o, n = oq[k], nq[k] / ratio
        if o <= 0:
            continue
        r = n / o
        if (r >= args.threshold or r <= 1 / args.threshold) and abs(n - o) >= args.abs_floor:
            flagged.append((k, o, n, r))
    flagged.sort(key=lambda t: -abs(t[2] - t[1]))

    if flagged:
        print(f"\n{len(flagged)} drift(s) beyond x{args.threshold} "
              f"(normalized, abs floor {args.abs_floor}s), largest absolute first:")
        for k, o, n, r in flagged:
            print(f"  {'REGRESSED' if r > 1 else 'improved '} {k}: "
                  f"{o:.2f}s -> {n:.2f}s (x{r:.2f} normalized, raw {nq[k]:.2f}s)")
        if any(r > 1 for _, _, _, r in flagged):
            print("\nregressions survived canary normalization — next step per the "
                  "drift protocol: same-day worktree replay of the old tree "
                  "(git worktree add, sbt package, time the flagged queries in "
                  "one spark-shell session against both jars).")
        return 1
    print("\nno per-query drift beyond the threshold after normalization.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
