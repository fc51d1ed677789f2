#!/bin/bash
# Dev-only oracle-independence check (driver-side tooling, like
# compare.py). Proves the DuckDB oracles RE-DERIVE expected results
# from the corpus spec instead of echoing the Spark implementation:
# each mutation below perturbs one SPARK-SIDE constant (leaving the
# oracle untouched), reruns the affected gate, and requires the compare
# to go RED. A gate that stayed green under a one-sided mutation would
# be echoing. The tree is restored after each mutation (aborts if the
# working tree is dirty).
#
# Usage: bash tools/oracle_mutation_check.sh [sfdir]   (default sf0.001)
#        bash tools/oracle_mutation_check.sh --selftest
# --selftest exercises the NON-evidence guards on purpose (a sed that
# matches nothing, a mutant that cannot compile) and requires run_case
# to reject both — proving the tool cannot mis-report a broken mutant
# run as "gate red".
set -u
SELFTEST=0
if [ "${1:-}" = "--selftest" ]; then SELFTEST=1; shift; fi
SF="${1:-/root/testdata/sf0.001}"
cd "$(dirname "$0")/.."
if ! git diff --quiet; then
  echo "ABORT: working tree dirty; commit or stash first" >&2
  exit 2
fi

run_case() { # name file sed_expr queries
  local name="$1" file="$2" expr="$3" queries="$4"
  echo "=== mutation: $name ==="
  sed -i "$expr" "$file"
  if git diff --quiet -- "$file"; then
    # a sed that matches nothing is a vacuous mutation — the gate would
    # stay green for the wrong reason
    echo "RESULT: $name SED MATCHED NOTHING (stale pattern — not evidence)"
    return 1
  fi
  git diff --stat | head -2
  local out="/tmp/mut_$name"
  rm -rf "$out"
  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify $SF $out $queries" \
    > "/tmp/mut_$name.log" 2>&1
  local rc=$?
  if [ $rc -ne 0 ]; then
    # a mutant that fails to compile/run proves NOTHING about the
    # oracle — without this check the empty compare output below would
    # be mis-read as "gate red", i.e. false independence evidence
    echo "RESULT: $name MUTATED BUILD/RUN FAILED (rc=$rc, see /tmp/mut_$name.log) — not evidence"
    git checkout -- "$file"
    return 1
  fi
  # every TARGET gate must actually have produced output — a missing
  # dir is non-evidence (the mutant run silently skipped the query),
  # distinct from a red compare
  local q
  for q in ${queries//,/ }; do
    if [ ! -d "$out/$q" ]; then
      echo "RESULT: $name TARGET OUTPUT $q MISSING — not evidence"
      git checkout -- "$file"
      return 1
    fi
  done
  local cmp cmp_rc
  # COMPARE_TOOL override exists only for the selftest's infra-failure
  # guard below; real runs always use tools/compare.py
  cmp=$(python3 "${COMPARE_TOOL:-tools/compare.py}" "$SF" "$out" "$queries" 2>&1)
  cmp_rc=$?
  echo "$cmp"
  git checkout -- "$file"
  # "gate red" evidence requires a GENUINE compare verdict, not merely
  # the absence of "OK rows": a compare.py infrastructure failure (a
  # traceback, an unreadable oracle_sql.json, a duckdb error) also
  # prints no OK line, and counting it as "caught" would be the same
  # false-evidence class the build/sed/output guards above reject
  if echo "$cmp" | grep -Eq "HASH MISMATCH|SCHEMA MISMATCH|: ROWS |MISSING spark output"; then
    echo "RESULT: $name caught (gate red as required)"
    return 0
  elif [ $cmp_rc -eq 0 ] && echo "$cmp" | grep -q "OK rows"; then
    echo "RESULT: $name ORACLE DID NOT CATCH THE MUTATION (echo risk)"
    return 1
  else
    echo "RESULT: $name COMPARE INFRA FAILURE (rc=$cmp_rc, no verdict line) — not evidence"
    return 1
  fi
}

if [ "$SELFTEST" -eq 1 ]; then
  st_fails=0
  # each case must be rejected BY THE SPECIFIC GUARD under test —
  # asserting only the exit code would pass vacuously if e.g. the
  # nocompile case's sed pattern drifted and the vacuous-sed guard
  # fired instead of the build-failure guard
  expect_guard() { # name file sed_expr queries expected_result_grep
    local want="$5" out rc
    out=$(run_case "$1" "$2" "$3" "$4"); rc=$?
    echo "$out"
    # BOTH halves of the rejection contract: run_case must return
    # non-zero (so a real run would not count the case as evidence) AND
    # the named guard must be the one that fired (so guards don't mask
    # each other when a sed pattern drifts)
    if [ "$rc" -eq 0 ]; then
      echo "SELFTEST FAIL: $1 was accepted as evidence (rc=0)"
      st_fails=1
    elif ! echo "$out" | grep -q "$want"; then
      echo "SELFTEST FAIL: $1 did not trip the '$want' guard"
      st_fails=1
    fi
  }
  # guard 1: a sed pattern matching nothing must be rejected, not
  # silently treated as a mutation
  expect_guard selftest_vacuous src/main/scala/graft/nlp/Nlp.scala \
    's/THIS_PATTERN_MATCHES_NOTHING_9f3a/x/' kg_value_triples \
    "SED MATCHED NOTHING"
  # guard 2: a mutant that cannot compile must be rejected, not
  # mis-read as a red gate
  expect_guard selftest_nocompile src/main/scala/graft/nlp/Nlp.scala \
    's/"million" -> 10000L/"million" -> THIS_DOES_NOT_COMPILE(/' \
    kg_value_triples \
    "MUTATED BUILD/RUN FAILED"
  # guard 3: a compare.py INFRASTRUCTURE failure (traceback, unreadable
  # oracle_sql.json, duckdb error — output with no verdict line) must be
  # rejected, not mis-read as "gate red". Uses a real mutation so the
  # run reaches the compare step, with the compare tool swapped for one
  # that dies like a crashing python process.
  cat > /tmp/graft_compare_crash.py <<'EOF'
import sys
print("Traceback (most recent call last):", file=sys.stderr)
print("RuntimeError: simulated compare infrastructure crash", file=sys.stderr)
sys.exit(1)
EOF
  # explicit set/unset: `VAR=x shell_function` scoping differs between
  # bash modes — do not rely on it
  COMPARE_TOOL=/tmp/graft_compare_crash.py
  expect_guard selftest_comparecrash src/main/scala/graft/nlp/Nlp.scala \
    's/"million" -> 10000L/"million" -> 1000000L/' \
    kg_value_triples \
    "COMPARE INFRA FAILURE"
  unset COMPARE_TOOL
  if [ "$st_fails" -eq 0 ]; then
    echo "SELFTEST OK — all three non-evidence guards reject as required"
  fi
  exit $st_fails
fi

fails=0
# 1. money table: the preserved million->10000 reference parity bug.
#    Spark side "fixed" to 1000000 must diverge from the oracle's
#    independent value arithmetic.
run_case money_multiplier src/main/scala/graft/nlp/Nlp.scala \
  's/"million" -> 10000L/"million" -> 1000000L/' \
  kg_value_triples || fails=1
# 2. PMI index threshold: Spark keeps cells > 0.1; oracle re-derives
#    the same cut from the corpus. A Spark-side threshold drift must go
#    red across the whole expansion family. 1.7 sits inside the
#    fixture's pmi range (1.52-2.08) so the mutation genuinely drops
#    rows — an in-range perturbation, not a vacuous one (0.2 changed
#    nothing: no fixture pmi falls in (0.1, 0.2]).
run_case pmi_threshold src/main/scala/graft/operators/EntitySetStage.scala \
  's/col("pmi") > 0.1/col("pmi") > 1.7/' \
  kg_entity_index,kg_entity_expansion || fails=1
# 3. soft-match threshold: at 0.15 the withheld diedIn candidates
#    (normalized distance 0.16 to bornIn) stop soft-matching, so the
#    Spark decode loses rows the oracle still derives.
run_case softmatch_threshold src/main/scala/graft/functions/Paths.scala \
  's/val MatchThreshold = 0.5/val MatchThreshold = 0.15/' \
  kg_triples_soft || fails=1

echo
if [ "$fails" -eq 0 ]; then
  echo "ALL MUTATIONS CAUGHT — oracles re-derive, none echo"
else
  echo "SOME MUTATION NOT CAUGHT — investigate before trusting the gates"
fi
exit $fails
