#!/bin/bash
# Sequential TPU job runner (ONE TPU process at a time — CLAUDE.md).
# Each job logs to /tmp/q_<name>.log; edit the job list and rerun remaining
# jobs by commenting out the finished ones.
set -u
cd /root/repo

run() {
  name=$1; shift
  budget=$1; shift
  if [ -f "/tmp/q_${name}.done" ]; then
    echo "skip ${name} (done)"; return
  fi
  echo "=== ${name}: $* (budget ${budget}s)"
  timeout "${budget}" "$@" > "/tmp/q_${name}.log" 2>&1
  rc=$?
  echo "rc=${rc}" >> "/tmp/q_${name}.log"
  [ $rc -eq 0 ] && touch "/tmp/q_${name}.done"
  echo "=== ${name} rc=${rc}"
  # a killed TPU compile can wedge the next claim for ~3-5 min; breathe
  [ $rc -ne 0 ] && sleep 180
}

run rc_hum_chunk 3600 python tools/bench_riccati_chunk.py chunk humanoid
run vpu_ceiling 1800 python tools/bench_vpu_ceiling.py
run prof_quad 5400 python tools/profile_mpc.py quadruped12 1024 50 ee
run prof_hum 5400 python tools/profile_mpc.py humanoid30 16 32
echo "QUEUE DONE"
