#!/usr/bin/env bash
# bench2.sh — host-drift-robust bench protocol (VERDICT r6 item 6; provenance
# hardened per VERDICT r7 item 3).
#
# The round-6 bisect (SCALING.md "bench variance bisect") showed the wide
# string-key shuffle family (q27/q28/q49/q65...) drifts up to ~1.7x across
# full JVM runs on this shared host with ZERO code change. graft.Bench
# already takes the per-query min over three in-process timed passes; this
# script adds the cross-JVM dimension: it runs the full Bench main N times
# (default 2, separate JVMs), then merges the per-query MINIMUM into one
# JSON line of the exact same shape.
#
# Provenance: the merged line lands in TWO places —
#   * $OUT (default /tmp/bench.json, what ad-hoc consumers read), and
#   * /tmp/bench2_merged.json (SPARK_GRAFT_BENCH_MERGED), the DEDICATED
#     protocol file. graft.Bench itself re-merges that file into its own
#     output at snapshot time iff the source fingerprint (src_sha), SF dir,
#     and query set all match — so the driver-recorded artifact carries the
#     min-of-N protocol even though the driver runs a fresh single JVM.
# Each pass runs with SPARK_GRAFT_NO_MERGE so passes are pure single-JVM
# samples; the merge refuses mixed-source passes (src_sha mismatch), closing
# the silent same-name code-drift hole.
#
# Usage: tools/bench2.sh [sf_dir] [passes] [out_file]
#   sf_dir   default /root/testdata/sf0.1
#   passes   default 2
#   out      default /tmp/bench.json  (same file the driver reads)
set -euo pipefail
SF_DIR="${1:-${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}}"
PASSES="${2:-2}"
OUT="${3:-${SPARK_GRAFT_BENCH_OUT:-/tmp/bench.json}}"
MERGED="${SPARK_GRAFT_BENCH_MERGED:-/tmp/bench2_merged.json}"
CPUS="${SPARK_GRAFT_CPUS:-32}"
cd "$(dirname "$0")/.."

rm -f "$MERGED"
RUNS=()
for i in $(seq 1 "$PASSES"); do
  f="/tmp/bench_pass${i}.json"
  echo "bench2: pass $i/$PASSES ..." >&2
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$CPUS" \
    SPARK_GRAFT_BENCH_OUT="$f" SPARK_GRAFT_NO_MERGE=1 \
    sbt -batch "runMain graft.Bench" >&2
  RUNS+=("$f")
done

python3 - "$OUT" "$MERGED" "${RUNS[@]}" <<'EOF'
import json, sys
out, merged_path, runs = sys.argv[1], sys.argv[2], sys.argv[3:]
ds = [json.load(open(f)) for f in runs]
names = list(ds[0]["queries"])
assert all(set(d["queries"]) == set(names) for d in ds), "query sets differ between passes"
shas = {d.get("src_sha", "") for d in ds}
assert len(shas) == 1 and "unknown" not in shas, \
    f"passes ran different source trees (src_sha {shas}) — refusing to merge"
dshas = {d.get("data_sha", "") for d in ds}
assert len(dshas) == 1 and "" not in dshas and "unknown" not in dshas, \
    f"passes ran different datasets (data_sha {dshas}) — refusing to merge"
# A query that threw records a FAST FAILURE wall time; letting it into the
# per-query min would publish a failure as a clean success (ADVICE r8).
# graft.Bench already hard-fails such a pass, so reaching here with errors
# means someone hand-fed a doctored pass file: refuse outright.
for f, d in zip(runs, ds):
    assert not d.get("errors"), \
        f"pass {f} reports errors {sorted(d['errors'])} — refusing to merge"
merged = {q: min(d["queries"][q] for d in ds) for q in names}
res = {"metric": "total", "value": sum(merged.values()), "unit": "sec",
       "queries": merged, "errors": {}, "sf": ds[0]["sf"],
       "protocol": f"min over {len(ds)} full JVM run(s) x 3 in-process passes",
       "runs": len(ds), "src_sha": shas.pop(), "data_sha": dshas.pop()}
# host-speed canary (round-12): min over passes, for cross-round
# normalization before any worktree replay
canaries = [d["host_canary_sec"] for d in ds if "host_canary_sec" in d]
if canaries:
    res["host_canary_sec"] = min(canaries)
# shuffle-shaped canary (round-19): same min-over-passes rule; the two
# canaries bracket CPU-bound vs shuffle/serialization-bound host drift
shuffle_canaries = [d["host_canary_shuffle_sec"] for d in ds
                    if "host_canary_shuffle_sec" in d]
if shuffle_canaries:
    res["host_canary_shuffle_sec"] = min(shuffle_canaries)
# sink-measured set (round-14): the cleaner family is timed to a parquet
# sink, not a count — carry the self-description into the merged artifact
sinks = {tuple(d.get("sink_measured", [])) for d in ds}
assert len(sinks) == 1, f"passes disagree on sink_measured {sinks}"
res["sink_measured"] = list(sinks.pop())
line = json.dumps(res, separators=(",", ":"))
print(line)
for path in (out, merged_path):
    open(path, "w").write(line + "\n")
per_run = [d["value"] for d in ds]
print(f"bench2: per-run totals {per_run} -> merged {res['value']:.2f} s (also {merged_path})", file=sys.stderr)
EOF
