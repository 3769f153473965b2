#!/bin/bash
# Pending TPU measurements queued behind the axon-tunnel outage (2026-08-18).
# Run when `python -c "import jax; jax.devices()"` responds again.
# Strictly sequential — the tunnel allows ONE client.
set -x
cd "$(dirname "$0")/.."

# 1. headline bench at HEAD (quality-gated)
timeout 1800 python bench.py 2>/tmp/bench_head.err | tee /tmp/bench_head.json

# 2. loft interior secondary bench
timeout 1800 python bench.py --scene loft 2>/tmp/bench_loft.err | tee /tmp/bench_loft.json

# 3. the north-star 1024-spp cross-platform RMSE (CPU half already at
#    /tmp/conv_cpu.npz; rerun it if missing)
[ -f /tmp/conv_cpu.npz ] || timeout 3600 python experiments/convergence_1024.py \
    --platform cpu --out /tmp/conv_cpu.npz
timeout 1800 python experiments/convergence_1024.py --platform tpu --out /tmp/conv_tpu.npz
python experiments/convergence_1024.py --compare /tmp/conv_tpu.npz /tmp/conv_cpu.npz
