#!/usr/bin/env bash
# bench2.sh — host-drift-robust bench protocol (VERDICT r6 item 6).
#
# The round-6 bisect (SCALING.md "bench variance bisect") showed the wide
# string-key shuffle family (q27/q28/q49/q65...) drifts up to ~1.7x across
# full JVM runs on this shared host with ZERO code change. graft.Bench
# already takes the per-query min over three in-process timed passes; this
# script adds the cross-JVM dimension: it runs the full Bench main N times
# (default 2, separate JVMs), then merges the per-query MINIMUM into one
# JSON line of the exact same shape, so a single-run load spike can never
# burn a verdict cycle on noise again.
#
# Usage: tools/bench2.sh [sf_dir] [passes] [out_file]
#   sf_dir   default /root/testdata/sf0.1
#   passes   default 2
#   out      default /tmp/bench.json  (same file the driver reads)
set -euo pipefail
SF_DIR="${1:-${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}}"
PASSES="${2:-2}"
OUT="${3:-${SPARK_GRAFT_BENCH_OUT:-/tmp/bench.json}}"
CPUS="${SPARK_GRAFT_CPUS:-32}"
cd "$(dirname "$0")/.."

RUNS=()
for i in $(seq 1 "$PASSES"); do
  f="/tmp/bench_pass${i}.json"
  echo "bench2: pass $i/$PASSES ..." >&2
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$CPUS" \
    SPARK_GRAFT_BENCH_OUT="$f" sbt -batch "runMain graft.Bench" >&2
  RUNS+=("$f")
done

python3 - "$OUT" "${RUNS[@]}" <<'EOF'
import json, sys
out, runs = sys.argv[1], sys.argv[2:]
ds = [json.load(open(f)) for f in runs]
names = list(ds[0]["queries"])
assert all(set(d["queries"]) == set(names) for d in ds), "query sets differ between passes"
merged = {q: min(d["queries"][q] for d in ds) for q in names}
errors = {}
for d in ds:
    errors.update(d.get("errors", {}))
res = {"metric": "total", "value": sum(merged.values()), "unit": "sec",
       "queries": merged, "errors": errors, "sf": ds[0]["sf"],
       "protocol": f"min over {len(ds)} full JVM runs x 3 in-process passes"}
line = json.dumps(res, separators=(",", ":"))
print(line)
open(out, "w").write(line + "\n")
per_run = [d["value"] for d in ds]
print(f"bench2: per-run totals {per_run} -> merged {res['value']:.2f} s", file=sys.stderr)
EOF
