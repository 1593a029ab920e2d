#!/bin/bash
# Round-3 TPU measurement queue. Run inside tmux (survives tool timeouts).
# Each step is bounded and logs to TPU_RUNS.log; a wedged relay just makes
# a step time out and the queue moves on (re-run the script to retry).
cd /root/repo
LOG=/root/repo/TPU_RUNS.log
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

say "=== queue start ==="

# 0. liveness probe, retried until the relay answers (it wedges for long
# stretches and then recovers — memory: 1-8 min first transfer when healthy)
ALIVE=0
for i in $(seq 1 40); do
  say "probe attempt $i..."
  if timeout 600 python -c "
import jax, time
t0=time.time()
import jax.numpy as jnp
x=jnp.ones((8,8)); print('probe ok', float(x.sum()), f'{time.time()-t0:.1f}s', flush=True)
" >> "$LOG" 2>&1; then ALIVE=1; say "relay ALIVE"; break; fi
  say "probe $i failed; sleeping 120s"
  sleep 120
done
[ "$ALIVE" = 1 ] || { say "relay never answered; queue aborting"; exit 1; }

# 1. full bench (races pass/wf/mk x pcg/hash + fuse) — the headline
say "bench full..."
timeout 5400 python bench.py >> "$LOG" 2>&1 || say "bench FAILED"

# 2. cluster-size / MAXC sweep on the 2M heightfield (the accel wall)
say "cluster sweep..."
timeout 5400 python tools/sweep_cluster_size.py >> "$LOG" 2>&1 \
  || say "cluster sweep FAILED"

# 3. sweep-G on the heightfield accel bench
for G in 2 4 8; do
  say "bench_accel AKR_SWEEP_G=$G..."
  AKR_SWEEP_G=$G timeout 1800 python tools/bench_accel.py >> "$LOG" 2>&1 \
    || say "bench_accel G=$G FAILED"
done

# 4. MSE-vs-spp tables (BASELINE.md item 3): cbox then classroom
say "mse cbox..."
timeout 5400 python tools/benchmark_mse.py --res 256 --gt-spp 4096 \
  --out /root/repo/BENCH_MSE_CBOX.json >> "$LOG" 2>&1 || say "mse cbox FAILED"
say "mse classroom..."
timeout 5400 python tools/benchmark_mse.py \
  --scene scenes/classroom/scene.json --res 256 --gt-spp 1024 \
  --spp 4 16 64 --methods pt gpt \
  --out /root/repo/BENCH_MSE_CLASSROOM.json >> "$LOG" 2>&1 \
  || say "mse classroom FAILED"

say "=== queue done ==="
