#!/bin/bash
# Serial TPU probe queue runner.
#
# Round-3 lesson: round-critical probe state parked in /tmp evaporated with
# the machine; the runner and its results now live in the repo
# (benchmarks/probes/results/*.log) so every session can resume the
# decision playbook (NOTES_ROUND3.md) from committed evidence.
#
# Rules (see README.md): ONE process on the tunneled TPU at a time; probe
# the tunnel before each job; bound every job with `timeout`; append-only
# logs so a mid-queue death keeps earlier results.
#
# Usage:
#   benchmarks/probes/run_queue.sh            # default queue (all probes)
#   benchmarks/probes/run_queue.sh knobs kvar # named subset
set -u
cd "$(dirname "$0")/../.."
RESULTS=benchmarks/probes/results
mkdir -p "$RESULTS"

run_job() {
  local name=$1 tmo=$2; shift 2
  local log="$RESULTS/$name.log"
  echo "=== $name start $(date -u +%FT%TZ)" | tee -a "$log"
  if ! timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "=== $name SKIPPED: tunnel down $(date -u +%FT%TZ)" | tee -a "$log"
    return 1
  fi
  timeout "$tmo" "$@" >>"$log" 2>&1
  local rc=$?
  echo "=== $name done rc=$rc $(date -u +%FT%TZ)" | tee -a "$log"
  return $rc
}

want() {  # no args = run everything; else only named jobs
  [ $# -eq 0 ] && return 0
  local j
  for j in "$@"; do [ "$j" = "$CURRENT" ] && return 0; done
  return 1
}

CURRENT=knobs;      want "$@" && run_job knobs      4500 python benchmarks/probes/exp_knobs.py
CURRENT=flash_sweep; want "$@" && run_job flash_sweep 2700 python benchmarks/probes/exp_flash.py sweep
CURRENT=flash_long; want "$@" && run_job flash_long 2700 python benchmarks/probes/exp_flash.py long
CURRENT=ganprof;    want "$@" && run_job ganprof    3600 python benchmarks/probes/exp_ganprof.py
CURRENT=kvar;       want "$@" && run_job kvar       3600 python benchmarks/probes/exp_kvar.py
CURRENT=dense;      want "$@" && run_job dense      3600 python benchmarks/probes/exp_dense.py
CURRENT=ganstep;    want "$@" && run_job ganstep    3600 python benchmarks/probes/exp_ganstep.py
CURRENT=v1;         want "$@" && run_job v1         2700 python benchmarks/probes/exp_v1.py
CURRENT=ganfused;   want "$@" && run_job ganfused   4500 python benchmarks/probes/exp_ganfused.py
CURRENT=e2ewire;    want "$@" && run_job e2ewire    2700 python benchmarks/probes/exp_e2ewire.py
CURRENT=e2ewire2;   want "$@" && run_job e2ewire2   2700 python benchmarks/probes/exp_e2ewire2.py
CURRENT=e2e;        want "$@" && run_job e2e        2700 python benchmarks/probes/exp_e2e.py
echo "=== queue complete $(date -u +%FT%TZ)"
