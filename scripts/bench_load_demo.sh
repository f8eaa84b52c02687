#!/bin/bash
# Demonstration harness for the ambient-immunity claim (r19, extended
# r20): runs the relational-family bench subset under a DELIBERATE
# synthetic load window and shows, from the artifact alone, that
#   (a) window mode: a load window covering EXACTLY pass 1 (torn down
#       when the LAST pass-1 completion line appears, counted against
#       the query total — not on the first pass-2 line, which let the
#       first pass-2 query run loaded in both passes) inflates
#       single-shot rows but NOT the cross-pass min, so n_outliers
#       stays 0;
#   (b) straddle mode (r20): a load window STRADDLING the pass-1/
#       pass-2 boundary — the one shape the plain-reversal protocol
#       still admitted (it covered alphabetically-late queries twice;
#       r19's llm_winnow). With pass 2 a ROTATED reversal, the end of
#       pass 1 lands mid-pass-2, so the straddling window still
#       cannot cover any query twice: n_outliers stays 0;
#   (c) full mode: load covering the WHOLE run inflates the mins
#       themselves and the bands check FLAGS them (n_outliers > 0) —
#       and the r20 auto-recheck column shows them clean or confirmed.
# Usage: bash scripts/bench_load_demo.sh [window|straddle|full]
set -e
cd /root/repo
MODE="${1:-window}"
source <(grep '^ADD_OPENS=' scripts/verify_local.sh)
ONLY=$(python3 -c "
import json
b = json.load(open('bands.json'))['bands']
print(','.join(sorted(k for k in b if not k.startswith('llm_'))))")
NQ=$(echo "$ONLY" | tr ',' '\n' | grep -c .)
spin() {  # N busy cores until the stamp file disappears
  for i in $(seq 1 "$1"); do
    ( while [ -f /tmp/graft_load_on ]; do :; done ) &
  done
}
rm -f /tmp/graft_load_on /tmp/bench_load_demo.err
touch /tmp/bench_load_demo.err
case "$MODE" in
full)
  touch /tmp/graft_load_on; spin "${GRAFT_DEMO_SPINNERS:-24}" ;;
window)
  # load covers EXACTLY pass 1: up at the first pass-1 completion,
  # down when the COUNT of pass-1 completions reaches the query total
  # (the last pass-1 query has finished; nothing of pass 2 runs
  # loaded).
  ( P1=0
    tail -f /tmp/bench_load_demo.err 2>/dev/null | while read -r l; do
      case "$l" in
        *"(pass 1)"*)
          [ -f /tmp/graft_load_on ] || {
            touch /tmp/graft_load_on; spin "${GRAFT_DEMO_SPINNERS:-24}"; }
          P1=$((P1 + 1))
          [ "$P1" -ge "$NQ" ] && { rm -f /tmp/graft_load_on; break; } ;;
      esac
    done ) &
  WATCHER=$! ;;
straddle)
  # load straddles the pass boundary: up when ~80% of pass 1 is done,
  # down after ~20% of pass 2 — covers the tail of pass 1 AND the
  # head of pass 2, the r19 llm_winnow shape.
  ( P1=0; P2=0
    UP=$(( NQ * 8 / 10 )); DOWN=$(( NQ / 5 )); [ "$DOWN" -ge 1 ] || DOWN=1
    tail -f /tmp/bench_load_demo.err 2>/dev/null | while read -r l; do
      case "$l" in
        *"(pass 1)"*)
          P1=$((P1 + 1))
          [ "$P1" -ge "$UP" ] && [ ! -f /tmp/graft_load_on ] && {
            touch /tmp/graft_load_on; spin "${GRAFT_DEMO_SPINNERS:-24}"; } ;;
        *"(pass 2)"*)
          P2=$((P2 + 1))
          [ "$P2" -ge "$DOWN" ] && { rm -f /tmp/graft_load_on; break; } ;;
      esac
    done ) &
  WATCHER=$! ;;
*)
  echo "usage: $0 [window|straddle|full]"; exit 2 ;;
esac
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_N=2 SPARK_GRAFT_ONLY="$ONLY" \
java $ADD_OPENS -Xmx8g -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench 2>>/tmp/bench_load_demo.err | tail -1
rm -f /tmp/graft_load_on
[ -n "${WATCHER:-}" ] && kill "$WATCHER" 2>/dev/null
wait 2>/dev/null || true
