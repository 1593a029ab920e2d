#!/bin/bash
# End-to-end classroom throughput sweep over (cluster size, MAXC, sweep G).
# Run AFTER tools/tpu_queue.sh (relay confirmed alive). Each config is one
# bounded bench.py run; results append to TPU_RUNS.log as JSON lines.
cd /root/repo
LOG=/root/repo/TPU_RUNS.log
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

say "=== classroom config sweep ==="
for CFG in "128:64:4" "256:32:4" "512:16:4" "128:64:8" "512:16:8"; do
  CS=${CFG%%:*}; rest=${CFG#*:}; MC=${rest%%:*}; G=${rest##*:}
  say "classroom sweep C=$CS MAXC=$MC G=$G..."
  BENCH_FAST=1 BENCH_RES=128 BENCH_SPP=4 \
  AKR_CLUSTER_SIZE=$CS AKR_MAXC=$MC AKR_SWEEP_G=$G \
  timeout 2400 python bench.py >> "$LOG" 2>&1 \
    || say "sweep C=$CS MAXC=$MC G=$G FAILED"
done
say "=== classroom sweep done ==="
