#!/usr/bin/env bash
# check_final_head.sh — the final-HEAD bench invariant, made MECHANICAL
# (round-19 — VERDICT r18 item 1: three consecutive rounds had a closing-
# checklist claim fail a hostile re-measure, twice because a post-bench
# commit touched src/main after bench/full_rN.json was produced; the
# checklist was prose, so nothing tripped).
#
# Recomputes graft.Bench.srcSha() — SHA-256 over src/main/scala's sorted
# (path-string + content) .scala files, the exact merge-eligibility
# fingerprint every bench artifact carries — over the COMMITTED tree and
# fails unless it equals the artifact's src_sha. A dirty src/main/scala is
# an automatic FAIL: "on the final HEAD" is meaningless while edits are
# uncommitted.
#
# Run as the round's LAST act and quote the literal exit code in the round
# notes. The rule it enforces: if any post-bench commit touches src/main,
# re-run the bench (tools/bench2.sh + re-commit the artifact) or revert
# the commit.
#
# Usage: tools/check_final_head.sh bench/full_rN.json
set -euo pipefail
ART="${1:?usage: tools/check_final_head.sh bench/full_rN.json}"
cd "$(dirname "$0")/.."

if ! git diff --quiet HEAD -- src/main/scala || \
   [ -n "$(git status --porcelain src/main/scala)" ]; then
  echo "FAIL: src/main/scala has uncommitted/untracked changes — 'the artifact is on HEAD' is unprovable; commit or stash first" >&2
  exit 1
fi

want=$(python3 -c 'import json,sys; print(json.loads(open(sys.argv[1]).readline()).get("src_sha",""))' "$ART")
have=$(python3 - <<'EOF'
import hashlib, pathlib
# replicates graft.Bench.srcSha(): sorted path-string + raw content bytes
md = hashlib.sha256()
for p in sorted(pathlib.Path("src/main/scala").rglob("*.scala"), key=str):
    md.update(str(p).encode("utf-8"))
    md.update(p.read_bytes())
print(md.hexdigest())
EOF
)

if [ -n "$want" ] && [ "$want" = "$have" ]; then
  echo "OK: $ART src_sha $want matches the committed src/main/scala tree"
else
  echo "FAIL: $ART carries src_sha='$want' but the committed tree hashes to '$have' — a post-bench commit touched src/main; re-run the bench on HEAD (tools/bench2.sh) and re-commit the artifact, or revert" >&2
  exit 1
fi
