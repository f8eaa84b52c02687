#!/bin/bash
# Demonstration harness for the ambient-immunity claim (r19): runs the
# relational-family bench subset under a DELIBERATE synthetic load
# window and shows, from the artifact alone, that
#   (a) a load window covering ONE pass inflates single-shot rows but
#       NOT the cross-pass min (different orders -> the window cannot
#       cover the same query twice), so n_outliers stays 0;
#   (b) load covering the WHOLE run inflates the mins themselves and
#       the bands check FLAGS them (n_outliers > 0) — the self-flag a
#       driver-side reader needs.
# Usage: bash scripts/bench_load_demo.sh [window|full]
set -e
cd /root/repo
MODE="${1:-window}"
source <(grep '^ADD_OPENS=' scripts/verify_local.sh)
ONLY=$(python3 -c "
import json
b = json.load(open('bands.json'))['bands']
print(','.join(sorted(k for k in b if not k.startswith('llm_'))))")
spin() {  # N busy cores until the stamp file disappears
  for i in $(seq 1 "$1"); do
    ( while [ -f /tmp/graft_load_on ]; do :; done ) &
  done
}
rm -f /tmp/graft_load_on /tmp/bench_load_demo.err
touch /tmp/bench_load_demo.err
if [ "$MODE" = "full" ]; then
  touch /tmp/graft_load_on; spin "${GRAFT_DEMO_SPINNERS:-24}"
else
  # window mode: the load covers EXACTLY pass 1 (the strongest form
  # of the claim — a window spanning one whole pass still cannot
  # touch the cross-pass min). Pass boundaries are read live from
  # the bench's stderr lines.
  ( tail -f /tmp/bench_load_demo.err 2>/dev/null | while read -r l; do
      case "$l" in
        *"(pass 1)"*) [ -f /tmp/graft_load_on ] || {
          touch /tmp/graft_load_on; spin "${GRAFT_DEMO_SPINNERS:-24}"; } ;;
        *"(pass 2)"*) rm -f /tmp/graft_load_on; break ;;
      esac
    done ) &
  WATCHER=$!
fi
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_N=2 SPARK_GRAFT_ONLY="$ONLY" \
java $ADD_OPENS -Xmx8g -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench 2>>/tmp/bench_load_demo.err | tail -1
rm -f /tmp/graft_load_on
[ -n "${WATCHER:-}" ] && kill "$WATCHER" 2>/dev/null
wait 2>/dev/null || true
