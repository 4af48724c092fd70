#!/usr/bin/env bash
# Hardened oracle sweep (SURVEY §6.9.6): Verify dump -> DuckDB cross-check,
# with every failure's NAME + ERROR text persisted to JSON regardless of
# what the terminal shows, and an automatic targeted re-check of any FAIL
# (a transient rig flake passes the focused re-run; a real regression
# fails twice and is reported as confirmed).
#
# Usage: tools/sweep.sh [sf_dir] [out_dir]
# Exits non-zero only on CONFIRMED failures, OR when the harness itself
# breaks (check.py crash, missing/unparseable result JSON) — a harness
# failure must never read as "all green" (ADVICE r12 item 1).
# Run AFTER the spec suite, never concurrently with it — parallel sbt JVMs
# contend for the rig and produced the r11 flake this script exists to
# de-noise.
set -u
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="${2:-/tmp/verify_out}"
LOG="$OUT_DIR/sweep.log"
mkdir -p "$OUT_DIR"
: > "$LOG"

# Extract the comma-joined 'failed' list from a check_result.json; prints
# HARNESS_ERROR and returns 1 if the file is missing or unparseable so a
# broken harness can never expand to "zero failures".
failed_list() {
  python3 - "$1" <<'PY'
import json, sys
try:
    print(','.join(json.load(open(sys.argv[1]))['failed']))
except Exception as e:
    print('HARNESS_ERROR: %s' % e, file=sys.stderr)
    sys.exit(1)
PY
}

echo "[sweep] verify dump: $SF_DIR -> $OUT_DIR" | tee -a "$LOG"
sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR" >> "$LOG" 2>&1
rc=$?
if [ $rc -ne 0 ]; then
  echo "[sweep] VERIFY RUN FAILED rc=$rc — tail of log:" | tee -a "$LOG"
  tail -20 "$LOG"
  exit $rc
fi

echo "[sweep] duckdb cross-check" | tee -a "$LOG"
rm -f "$OUT_DIR/check_result.json"   # a stale result must not mask a crash
python3 tools/check.py "$SF_DIR" "$OUT_DIR" >> "$LOG" 2>&1
check_rc=$?
if [ $check_rc -ne 0 ]; then
  echo "[sweep] CHECK HARNESS FAILED rc=$check_rc — tail of log:" | tee -a "$LOG"
  tail -20 "$LOG"
  exit $check_rc
fi
# names + errors now live in $OUT_DIR/check_result.json no matter what
if ! FAILED=$(failed_list "$OUT_DIR/check_result.json"); then
  echo "[sweep] CHECK RESULT UNREADABLE ($OUT_DIR/check_result.json) — tail of log:" | tee -a "$LOG"
  tail -20 "$LOG"
  exit 2
fi

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
rm -f "$RECHECK_DIR/check_result.json"
sbt -batch "runMain graft.Verify $SF_DIR $RECHECK_DIR $FAILED" >> "$LOG" 2>&1
rc=$?
if [ $rc -ne 0 ]; then
  echo "[sweep] RE-CHECK VERIFY RUN FAILED rc=$rc — tail of log:" | tee -a "$LOG"
  tail -20 "$LOG"
  exit $rc
fi
python3 tools/check.py "$SF_DIR" "$RECHECK_DIR" "$FAILED" >> "$LOG" 2>&1
check_rc=$?
if [ $check_rc -ne 0 ]; then
  echo "[sweep] RE-CHECK HARNESS FAILED rc=$check_rc — tail of log:" | tee -a "$LOG"
  tail -20 "$LOG"
  exit $check_rc
fi
if ! CONFIRMED=$(failed_list "$RECHECK_DIR/check_result.json"); then
  echo "[sweep] RE-CHECK RESULT UNREADABLE ($RECHECK_DIR/check_result.json)" | tee -a "$LOG"
  tail -20 "$LOG"
  exit 2
fi

if [ -z "$CONFIRMED" ]; then
  echo "[sweep] all initial FAILs passed the focused re-run -> transient"
  echo "[sweep] (first-run errors preserved in $OUT_DIR/check_result.json)"
  exit 0
fi
echo "[sweep] CONFIRMED FAILURES: $CONFIRMED"
echo "[sweep] details: $RECHECK_DIR/check_result.json ; full log: $LOG"
exit 1
