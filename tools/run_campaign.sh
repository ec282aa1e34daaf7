#!/bin/bash
# Round-3 serialized TPU measurement campaign (ONE process at a time —
# concurrent tunnel clients wedge the axon backend; docs/TPU_NOTES.md v3).
cd /root/repo
LOG=${1:-/tmp/campaign_r3.log}
: > "$LOG"
run() {
  echo "=== $* ===" >> "$LOG"
  timeout 1500 "$@" 2>>"$LOG" >> "$LOG"
  echo "--- rc=$? ---" >> "$LOG"
}
# pre-seed kmer cache locations from legacy cache names where available
C=~/.cache/hsa_tpu_bench
mkdir -p $C/idxdir_3100M_s16 && cp -n $C/kmer12_3100M_s16.npz $C/idxdir_3100M_s16/kmer12.npz 2>/dev/null
run python -u benchmarks/accuracy.py
run env HSA_BENCH_GENOME_MODEL=repeats python -u benchmarks/accuracy.py
run python -u benchmarks/config1_exact.py
run python -u benchmarks/config2_1mm.py
run python -u benchmarks/config3_gapped.py
run python -u benchmarks/config4_paired.py
run env JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 python -u benchmarks/config5_multishard.py
run env HSA_BENCH_GENOME_MODEL=repeats HSA_BENCH_ITERS=4 python -u bench.py
run env HSA_BENCH_GENOME_MBP=3100 HSA_BENCH_SA_INTV=16 HSA_BENCH_ITERS=3 python -u bench.py
run python -u tools/gather_probe3.py
echo DONE >> "$LOG"
