#!/usr/bin/env bash
# Gate-on-the-gate: prove the differential harness (Verify + tools/check.py)
# actually FAILS when an operator is miscompiled. GRAFT_MUTATE=1 makes
# Pipeline deliberately miscompile two queries (see Pipeline.mutateGate):
#   - p66_audio16_decode: amp_sum cast to double  -> dtype-class path RED
#   - p72_url_canonicalize: n_params_kept + 1     -> value/hash path RED
# The clean run of the same two queries must stay green. Exit 0 only when
# all four assertions hold.
#
# Usage: bash tools/mutation_check.sh [sfDir]
set -u
SF=${1:-/root/testdata/sf0.01}
OUT=/tmp/mutation_check
rm -rf "$OUT.clean" "$OUT.mut"

sbt -batch "runMain graft.Verify $SF $OUT.clean p66,p72" >/dev/null 2>&1
python3 tools/check.py "$SF" "$OUT.clean" > "$OUT.clean.log" 2>&1
grep -q "2 pass, 0 fail" "$OUT.clean.log" || {
  echo "[mutation] FAIL: clean control run not green"; cat "$OUT.clean.log"; exit 1; }

GRAFT_MUTATE=1 sbt -batch "runMain graft.Verify $SF $OUT.mut p66,p72" >/dev/null 2>&1
python3 tools/check.py "$SF" "$OUT.mut" > "$OUT.mut.log" 2>&1
grep -q "FAIL p66_audio16_decode: dtype mismatch" "$OUT.mut.log" || {
  echo "[mutation] FAIL: dtype-class path did not trip"; cat "$OUT.mut.log"; exit 1; }
grep -q "FAIL p72_url_canonicalize: cell mismatch" "$OUT.mut.log" || {
  echo "[mutation] FAIL: value/hash path did not trip"; cat "$OUT.mut.log"; exit 1; }
grep -q "0 pass, 2 fail" "$OUT.mut.log" || {
  echo "[mutation] FAIL: unexpected totals"; cat "$OUT.mut.log"; exit 1; }

echo "[mutation] gate sensitivity proven: clean = 2 pass / 0 fail;" \
  "mutated = dtype RED (p66) + cell RED (p72)"
