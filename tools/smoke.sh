#!/usr/bin/env bash
# End-of-round smoke gate. Run before every snapshot/commit of substance:
#
#   tools/smoke.sh            # full: sbt test + Verify at sf0.001
#   tools/smoke.sh --verify   # Verify only (fast re-check after a query edit)
#
# Fails (non-zero) if:
#   - the test suite does not compile or any test fails
#     (includes the 106 golden-corpus pattern cases in CorpusWideSpec /
#      CorpusNarrowSpec / CorpusIvolgaSpec — local evidence for pattern
#      semantics even when the driver's DuckDB oracle is down), or
#   - any SparkEntry query errors during Verify (detected via the loud
#     _failed.json that Verify now always writes), or
#   - a query is declared in `queries` but produced no output directory.
#
# Round 7 shipped a non-compiling test suite and 20 silently-errored queries;
# this gate exists so that class of failure cannot ship again.
set -uo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${SMOKE_SF_DIR:-/root/testdata/sf0.001}"
OUT="$(mktemp -d /tmp/graft-smoke.XXXXXX)"
trap 'rm -rf "$OUT"' EXIT

run_tests=1
[[ "${1:-}" == "--verify" ]] && run_tests=0

if [[ $run_tests == 1 ]]; then
  echo "[smoke] sbt test ..."
  if ! sbt -batch test > "$OUT/test.log" 2>&1; then
    echo "[smoke] FAIL: sbt test (tail of log):"
    tail -30 "$OUT/test.log"
    exit 1
  fi
  grep -E "Tests: succeeded|All tests passed" "$OUT/test.log" | tail -2
  # surface golden-corpus counts so pattern semantics have visible evidence
  grep -oE "Corpus(Wide|Narrow|Ivolga)[A-Za-z]*Spec" "$OUT/test.log" | sort | uniq -c || true
fi

echo "[smoke] Verify @ $SF_DIR ..."
if ! sbt -batch "runMain graft.Verify $SF_DIR $OUT/verify" > "$OUT/verify.log" 2>&1; then
  echo "[smoke] FAIL: Verify crashed (tail of log):"
  tail -30 "$OUT/verify.log"
  exit 1
fi

fails=$(cat "$OUT/verify/_failed.json" 2>/dev/null || echo MISSING)
if [[ "$fails" == "MISSING" ]]; then
  echo "[smoke] FAIL: Verify wrote no _failed.json (crashed before the end?)"
  exit 1
elif [[ "$fails" != "{}" ]]; then
  echo "[smoke] FAIL: queries errored during Verify:"
  echo "$fails"
  exit 1
fi

# every declared query must have produced a parquet dir
missing=0
for q in $(grep -oE '"[a-z0-9_]+":' "$OUT/verify/oracle_sql.json" | tr -d '":'); do
  if [[ ! -d "$OUT/verify/$q" ]]; then
    echo "[smoke] FAIL: query '$q' declared but produced no output"
    missing=1
  fi
done
[[ $missing == 1 ]] && exit 1

n=$(find "$OUT/verify" -mindepth 1 -maxdepth 1 -type d | wc -l)
echo "[smoke] OK: $n query outputs, 0 failures"
