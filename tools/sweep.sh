#!/usr/bin/env bash
# Hardened oracle sweep (SURVEY §6.9.6): Verify dump -> DuckDB cross-check,
# with every failure's NAME + ERROR text persisted to JSON regardless of
# what the terminal shows, and an automatic targeted re-check of any FAIL
# (a transient rig flake passes the focused re-run; a real regression
# fails twice and is reported as confirmed).
#
# Usage: tools/sweep.sh [sf_dir] [out_dir]
# Exits non-zero only on CONFIRMED failures. Run AFTER the spec suite,
# never concurrently with it — parallel sbt JVMs contend for the rig and
# produced the r11 flake this script exists to de-noise.
set -u
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="${2:-/tmp/verify_out}"
LOG="$OUT_DIR/sweep.log"
mkdir -p "$OUT_DIR"
: > "$LOG"

echo "[sweep] verify dump: $SF_DIR -> $OUT_DIR" | tee -a "$LOG"
sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR" >> "$LOG" 2>&1
rc=$?
if [ $rc -ne 0 ]; then
  echo "[sweep] VERIFY RUN FAILED rc=$rc — tail of log:" | tee -a "$LOG"
  tail -20 "$LOG"
  exit $rc
fi

echo "[sweep] duckdb cross-check" | tee -a "$LOG"
python3 tools/check.py "$SF_DIR" "$OUT_DIR" >> "$LOG" 2>&1
# names + errors now live in $OUT_DIR/check_result.json no matter what
FAILED=$(python3 -c "
import json
print(','.join(json.load(open('$OUT_DIR/check_result.json'))['failed']))")

if [ -z "$FAILED" ]; then
  grep -E "== .* pass" "$LOG" | tail -2
  echo "[sweep] all green"
  exit 0
fi

echo "[sweep] initial FAILs: $FAILED — targeted re-check" | tee -a "$LOG"
for q in ${FAILED//,/ }; do
  echo "[sweep] ---- $q: first-run error ----" | tee -a "$LOG"
  python3 -c "
import json
r = json.load(open('$OUT_DIR/check_result.json'))['queries']['$q']
print(r['detail'])" | tee -a "$LOG"
done

RECHECK_DIR="${OUT_DIR}_recheck"
mkdir -p "$RECHECK_DIR"
sbt -batch "runMain graft.Verify $SF_DIR $RECHECK_DIR $FAILED" >> "$LOG" 2>&1
python3 tools/check.py "$SF_DIR" "$RECHECK_DIR" "$FAILED" >> "$LOG" 2>&1
CONFIRMED=$(python3 -c "
import json
print(','.join(json.load(open('$RECHECK_DIR/check_result.json'))['failed']))")

if [ -z "$CONFIRMED" ]; then
  echo "[sweep] all initial FAILs passed the focused re-run -> transient"
  echo "[sweep] (first-run errors preserved in $OUT_DIR/check_result.json)"
  exit 0
fi
echo "[sweep] CONFIRMED FAILURES: $CONFIRMED"
echo "[sweep] details: $RECHECK_DIR/check_result.json ; full log: $LOG"
exit 1
