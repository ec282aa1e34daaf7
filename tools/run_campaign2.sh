#!/bin/bash
# Round-3 rerun set (after fixes: pow2-rid, native DP, select lanes, psum counter)
cd /root/repo
LOG=${1:-/tmp/campaign2_r3.log}
: > "$LOG"
run() {
  echo "=== $* ===" >> "$LOG"
  timeout 1500 "$@" 2>>"$LOG" >> "$LOG"
  echo "--- rc=$? ---" >> "$LOG"
}
run env HSA_BENCH_GENOME_MODEL=repeats HSA_BENCH_ITERS=4 python -u bench.py
run env HSA_BENCH_GENOME_MODEL=repeats python -u benchmarks/accuracy.py
run env HSA_BENCH_BATCH=16384 python -u benchmarks/config3_gapped.py
run env JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 python -u benchmarks/config5_multishard.py
run env HSA_BENCH_ITERS=6 python -u bench.py
echo DONE >> "$LOG"
