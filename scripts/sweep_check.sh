#!/bin/bash
# End-of-round sweep-discipline gate: passes iff the recorded sf0.1
# sweep stamp (written by scripts/verify_sf01.sh on a green run)
# covers the LAST code commit — i.e. no commit touching src/main or
# build.sbt landed after the sweep ran, and the sweep tree was clean.
# Run this right before the round's snapshot commit; if it fails,
# rerun `bash scripts/verify_sf01.sh` (minutes) and re-check.
set -e
cd /root/repo
STAMP=VERIFY_SF01_STAMP.json
if [ ! -f "$STAMP" ]; then
  echo "SWEEP-CHECK FAIL: no $STAMP — run scripts/verify_sf01.sh first"
  exit 1
fi
HEAD_REC=$(python3 -c "import json; print(json.load(open('$STAMP'))['head'])")
DIRTY=$(python3 -c "import json; print(json.load(open('$STAMP'))['dirty'])")
SCOPE=$(python3 -c "import json; print(json.load(open('$STAMP'))['scope'])")
if [ "$DIRTY" = "True" ] || [ "$DIRTY" = "true" ]; then
  echo "SWEEP-CHECK FAIL: stamped sweep ran on a dirty src/main tree" \
       "(stamp head $HEAD_REC) — rerun scripts/verify_sf01.sh on the" \
       "committed tree"
  exit 1
fi
# last commit that could have changed a query plan
LAST_CODE=$(git log -1 --format=%H -- src/main build.sbt)
if [ -n "$(git status --porcelain -- src/main build.sbt)" ]; then
  echo "SWEEP-CHECK FAIL: src/main or build.sbt has uncommitted edits" \
       "— commit (or revert) them, rerun scripts/verify_sf01.sh, re-check"
  exit 1
fi
if [ "$HEAD_REC" = "$LAST_CODE" ] \
   || git merge-base --is-ancestor "$LAST_CODE" "$HEAD_REC" 2>/dev/null; then
  echo "SWEEP-CHECK OK: sf0.1 sweep (scope=$SCOPE, head=${HEAD_REC:0:9})" \
       "covers the last code commit (${LAST_CODE:0:9})"
else
  echo "SWEEP-CHECK FAIL: last code commit ${LAST_CODE:0:9} postdates" \
       "the recorded sweep (${HEAD_REC:0:9}) — rerun scripts/verify_sf01.sh"
  exit 1
fi
