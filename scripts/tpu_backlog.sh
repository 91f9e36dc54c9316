#!/usr/bin/env bash
# Round-3 on-chip measurement backlog (run when the axon tunnel is back).
#
# Rules (docs + hard-won): ONE TPU process at a time; generous timeouts
# (first compiles ride a remote tunnel, 2-10 min per new shape); never
# SIGKILL mid-compile unless necessary (orphaned remote work stalls the
# server 10-30+ min). Each step logs to /tmp/tpu_backlog/<step>.log and
# the JSON line (stdout) is captured separately.
set -u
OUT=${OUT:-/tmp/tpu_backlog}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() { # name timeout_s cmd...
  local name=$1 t=$2; shift 2
  echo "=== $name (timeout ${t}s): $*" | tee -a "$OUT/driver.log"
  timeout "$t" "$@" > "$OUT/$name.json" 2> "$OUT/$name.log"
  local rc=$?
  echo "=== $name rc=$rc" | tee -a "$OUT/driver.log"
  tail -c 400 "$OUT/$name.json" | tee -a "$OUT/driver.log"
  echo | tee -a "$OUT/driver.log"
}

# 0. cheap liveness probe (fail fast if the tunnel is still down)
timeout 600 python -c "
import jax; print(jax.devices())
import jax.numpy as jnp; print(float(jnp.ones((256,256)).sum()))
" > "$OUT/probe.log" 2>&1 || { echo "TPU still down"; exit 1; }

# 1. headline: flagship config (segmented dantzig) — the regression check
run single_flagship 2400 python bench.py

# 2. headline: multiple pricing sweep (VERDICT #3 target >= 2200 p/s)
run single_mp8  2400 python bench.py --multi-price 8
run single_mp16 2400 python bench.py --multi-price 16
run single_mp32 2400 python bench.py --multi-price 32

# 3. machine-checked parity at benchmark scale (oracle rides inside)
run parity_8k 3600 python bench.py --mode parity

# 4. time-to-optimal (the 8.3 s round-2 number)
run full_8k 3600 python bench.py --mode full

# 5. sparse simplex core on chip (round-3 feature)
run sparse_8k 2400 python bench.py --mode sparse --m 8192 --n 16384 --no-oracle

# 6. general-form gate (two-phase + native bounds) dense and sparse
run general 3600 python bench.py --mode general
run general_sparse 3600 python bench.py --mode general --sparse

# 7. first-order mode incl. the sparse structured workload
run pdhg 2400 python bench.py --mode pdhg --no-oracle
run pdhg_sparse 2400 python bench.py --mode pdhg --sparse

# 8. serving + batch
run reopt 2400 python bench.py --mode reopt
run batch 2400 python bench.py --mode batch

echo "backlog complete; results in $OUT" | tee -a "$OUT/driver.log"
