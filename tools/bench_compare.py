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

Replay adjudication (VERDICT r14 item 2): when the worktree-replay protocol
has adjudicated this round's surviving flags, the evidence lives in
bench/replay_rN.json (committed, one entry per flagged query: old-jar and
new-jar times from the SAME session, per-leg canaries, and a verdict).
This script auto-discovers replay_rN.json next to a NEW artifact named
full_rN.json (or takes --replay PATH) and SILENCES flags the replay
adjudicated with a WHITELISTED benign verdict ('host_drift',
'measurement_change', 'unverified_improvement', 'confirmed_improvement')
— a silenced flag is still printed, marked "adjudicated", with the
replay's own numbers. 'accepted_tradeoff' records an INTENTIONAL,
documented cost (the note must name the change and the doc that accepts
it — ENFORCED: a noteless accepted_tradeoff keeps the flag and exit code
live) so a deliberate trade does not read as an unexplained regression. A replay verdict of "code_regression" keeps the
flag (and the exit code) alive, and so does ANY unrecognized verdict
(ADVICE r15: a typo'd or novel verdict must not silently clear the
tripwire).

Improvement flags (VERDICT r15 item 6): an improvement with no replay
confirmation is PROVISIONAL — silently adopting it as the next round's
baseline absorbs host luck into the cross-round ledger. Provisional
improvements are labeled as such, and --emit-baseline PATH writes a copy
of the NEW artifact in which each provisional improvement carries the OLD
time forward (converted into the new artifact's canary units), plus a
`provisional_improvements` list naming them. Use that file as the OLD
side of the next round's compare until a replay confirms the speedup
(verdict 'confirmed_improvement') or it reproduces.

Exit code (round-18 — VERDICT r17 items 1/2: the improvements-only case
needs its own documented outcome so a round note can quote the literal
exit honestly): 0 when no query survives the drift filter after replay
adjudication; ALSO 0 — with an explicit PROVISIONAL banner — when the
only surviving flags are unconfirmed IMPROVEMENTS and --emit-baseline is
carrying their old times forward (the ledger rule is satisfied, nothing
is unexplained); 1 when any regression survives, or when unconfirmed
improvements are live WITHOUT --emit-baseline (nothing records the honest
pre-improvement base). Usable as a regression tripwire in a round's
closing checklist.
"""
import argparse
import json
import os
import re
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.readline())


def load_replay(args):
    """Replay evidence: explicit --replay wins; else bench/replay_rN.json
    sibling of a NEW artifact named full_rN.json. Returns (path, dict) or
    (None, {})."""
    path = args.replay
    if not path:
        m = re.match(r"full_(r\d+)\.json$", os.path.basename(args.new))
        if m:
            cand = os.path.join(os.path.dirname(args.new) or ".",
                                f"replay_{m.group(1)}.json")
            if os.path.exists(cand):
                path = cand
    if not path:
        return None, {}
    with open(path) as f:
        doc = json.load(f)
    return path, doc.get("queries", {})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.25,
                    help="normalized ratio beyond which a drift is flagged (default 1.25, both directions)")
    ap.add_argument("--abs-floor", type=float, default=0.15,
                    help="minimum absolute delta in seconds for a flag (default 0.15)")
    ap.add_argument("--replay", default=None,
                    help="replay-adjudication artifact (default: auto-discover "
                         "bench/replay_rN.json next to a NEW artifact named full_rN.json)")
    ap.add_argument("--emit-baseline", default=None, metavar="PATH",
                    help="write a copy of NEW with provisional (unconfirmed) "
                         "improvements carrying the OLD time forward — the "
                         "honest OLD side for the next round's compare")
    args = ap.parse_args()
    replay_path, replay = load_replay(args)
    if replay_path:
        print(f"replay adjudication: {replay_path} ({len(replay)} quer{'y' if len(replay) == 1 else 'ies'})")

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

    # Second, shuffle-shaped canary (round-19 — VERDICT r18 item 2): the CPU
    # canary under-captured drift whose signature is raw-parity totals with a
    # big normalized shift (shuffle/serialization-path host drift, the
    # round-6 wide-string-key family). When BOTH artifacts carry
    # host_canary_shuffle_sec, each query is normalized by WHICHEVER ratio
    # better explains it (brings its drift closer to 1) and flagged only if
    # NEITHER does — CPU-bound and shuffle-bound queries each get the host
    # model that matches their shape.
    os_, ns_ = old.get("host_canary_shuffle_sec"), new.get("host_canary_shuffle_sec")
    ratios = {"cpu": ratio}
    if os_ and ns_:
        sratio = ns_ / os_
        ratios["shuffle"] = sratio
        print(f"shuffle canary: old={os_:.3f}s new={ns_:.3f}s ratio={sratio:.3f} "
              f"(per-query normalization picks the canary that better explains each drift)")
    else:
        missing = [n for n, c in (("old", os_), ("new", ns_)) if not c]
        print(f"shuffle canary: missing in {', '.join(missing)} artifact(s) — "
              f"single-canary normalization this compare")

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
    best_ratio = {}  # query -> the normalization ratio that adjudicated it
    for k in shared:
        o = oq[k]
        if o <= 0:
            continue
        # normalize by each available canary; keep the one that brings the
        # drift closest to 1 — a drift is a finding only if NO host model
        # explains it
        cands = [(abs((nq[k] / rr) / o - 1), rr, lbl)
                 for lbl, rr in ratios.items()]
        _, rr, lbl = min(cands)
        best_ratio[k] = rr
        n = nq[k] / rr
        r = n / o
        if (r >= args.threshold or r <= 1 / args.threshold) and abs(n - o) >= args.abs_floor:
            flagged.append((k, o, n, r, lbl))
    flagged.sort(key=lambda t: -abs(t[2] - t[1]))

    # benign replay verdicts silence a flag; 'code_regression' and anything
    # unrecognized keep it live (whitelist, not blacklist — ADVICE r15)
    benign = {"host_drift", "measurement_change", "accepted_tradeoff",
              "unverified_improvement", "confirmed_improvement"}
    provisional = []
    if flagged:
        print(f"\n{len(flagged)} drift(s) beyond x{args.threshold} "
              f"(normalized, abs floor {args.abs_floor}s), largest absolute first:")
        live_flags = live_regressions = 0
        for k, o, n, r, lbl in flagged:
            adj = replay.get(k)
            verdict = adj.get("verdict") if adj is not None else None
            # accepted_tradeoff's contract is a note naming the change and
            # the doc that accepts it — a bare verdict is the silent-clear
            # class the whitelist exists to prevent
            noteless_tradeoff = (verdict == "accepted_tradeoff" and
                                 not str(adj.get("note") or "").strip())
            if noteless_tradeoff:
                print(f"  accepted_tradeoff for {k} carries NO note — "
                      f"treating the flag as live (the note must name the "
                      f"change and the accepting doc)")
            elif verdict in benign:
                if verdict == "unverified_improvement":
                    provisional.append(k)
                print(f"  adjudicated {k}: {o:.2f}s -> {n:.2f}s (x{r:.2f} {lbl}-normalized) — "
                      f"replay verdict '{verdict}': old jar {adj.get('old_jar_sec')}s "
                      f"vs new jar {adj.get('new_jar_sec')}s same-session"
                      + (f" ({adj.get('note')})" if adj.get("note") else ""))
                continue
            if adj is not None and verdict != "code_regression" and \
                    not noteless_tradeoff:
                print(f"  UNRECOGNIZED replay verdict '{verdict}' for {k} — "
                      f"treating the flag as live (benign verdicts: "
                      f"{', '.join(sorted(benign))})")
            live_flags += 1
            if r > 1:
                live_regressions += 1
                print(f"  REGRESSED {k}: "
                      f"{o:.2f}s -> {n:.2f}s (x{r:.2f} {lbl}-normalized, raw {nq[k]:.2f}s)")
            else:
                provisional.append(k)
                print(f"  improved  {k} [PROVISIONAL — unconfirmed]: "
                      f"{o:.2f}s -> {n:.2f}s (x{r:.2f} {lbl}-normalized, raw {nq[k]:.2f}s) — "
                      f"confirm with a replay leg or carry the old time forward "
                      f"(--emit-baseline)")
        emit_baseline(args, new, oq, ratio, provisional, best_ratio)
        if live_regressions:
            print("\nregressions survived canary normalization"
                  + (" and replay adjudication" if replay_path else "")
                  + " — next step per the drift protocol: same-day worktree replay "
                  "of the old tree (git worktree add, sbt package, time the flagged "
                  "queries in one spark-shell session against both jars), then commit "
                  "the per-query evidence as bench/replay_rN.json so this compare "
                  "can adjudicate.")
            return 1
        if live_flags:
            # every live flag is an improvement (regressions returned above)
            if args.emit_baseline:
                print("\nPROVISIONAL: the only live flags are unconfirmed "
                      "improvements, carried at their OLD times in the "
                      "emitted baseline (--emit-baseline) per the ledger "
                      "rule — exit 0; confirm with a replay leg or let the "
                      "next round reproduce them.")
                return 0
            print("\nunconfirmed improvements are live WITHOUT "
                  "--emit-baseline: nothing carries the honest "
                  "pre-improvement base forward — exit 1.")
            return 1
        print("\nevery flag adjudicated by the replay artifact.")
        return 0
    emit_baseline(args, new, oq, ratio, provisional, best_ratio)
    print("\nno per-query drift beyond the threshold after normalization.")
    return 0


def emit_baseline(args, new, oq, ratio, provisional, best_ratio):
    """Write NEW with provisional improvements reset to the OLD time
    (denormalized into the new artifact's canary units) so the next round
    compares against the honest pre-improvement base until confirmed."""
    if not args.emit_baseline:
        return
    doc = dict(new)
    doc["queries"] = dict(new["queries"])
    for k in provisional:
        doc["queries"][k] = oq[k] * ratio
    doc["provisional_improvements"] = sorted(provisional)
    with open(args.emit_baseline, "w") as f:
        json.dump(doc, f)
        f.write("\n")
    print(f"baseline emitted to {args.emit_baseline} "
          f"({len(provisional)} provisional improvement(s) carried at the old time)")


if __name__ == "__main__":
    sys.exit(main())
