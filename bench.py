#!/usr/bin/env python3
"""Benchmark: zeng-biHomE training throughput (pairs/sec/chip) on TPU.

Runs the flagship config's fused train step (on-device datagen + Rethinking
DoubleLine forward + DSAC + biHomE loss + backward + Adam) on synthetic
320x240 source images and reports sustained throughput against the
BASELINE.json target of 10,000 128x128 image-pairs/sec/chip on TPU v5e.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pairs/s/chip", "vs_baseline": N/10000}

Env knobs: BENCH_BATCH (default 64 — the reference training batch),
BENCH_STEPS (timed steps, default 20), BENCH_CONFIG (default
config/pds-coco/zeng-bihome-lr-1e-3.yaml).
"""

import json
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp
import numpy as np

from bihome_tpu import config as config_lib
from bihome_tpu.data import synthetic
from bihome_tpu.parallel import mesh as mesh_lib
from bihome_tpu.training import trainer as trainer_lib
from bihome_tpu.training import train_state as ts_lib

BASELINE_PAIRS_PER_SEC_PER_CHIP = 10_000.0


def main():
    batch = int(os.environ.get('BENCH_BATCH', '64'))
    steps = int(os.environ.get('BENCH_STEPS', '20'))
    config_path = os.environ.get(
        'BENCH_CONFIG', 'config/pds-coco/zeng-bihome-lr-1e-3.yaml')

    config = config_lib.load_config(config_path)
    built = config_lib.build_model(config)
    tx, schedule = ts_lib.make_optimizer(**config_lib.solver_kwargs(config))

    num_chips = len(jax.devices())
    mesh = mesh_lib.make_mesh()

    # Device-resident synthetic source pool; per-step batch gathered by
    # index on device (the input pipeline streams uint8 from host in real
    # training; datagen itself is the benchmarked on-device path).
    pool = jnp.asarray(synthetic.make_image_pool(max(batch, 64), 240, 320,
                                                 seed=0))
    pool = jax.device_put(pool, mesh_lib.replicated_sharding(mesh))

    sample = np.asarray(pool[:batch])
    variables = trainer_lib.init_model(built, sample)
    state = ts_lib.create_train_state(variables, tx)
    state = jax.device_put(state, mesh_lib.replicated_sharding(mesh))

    raw_step = trainer_lib.make_train_step(built, tx, schedule)

    def bench_step(state, pool, rng):
        idx = jax.random.randint(jax.random.fold_in(rng, state.step),
                                 (batch,), 0, pool.shape[0])
        images = jnp.take(pool, idx, axis=0)
        return raw_step(state, images, rng)

    step_fn = jax.jit(bench_step, donate_argnums=(0,))
    rng = jax.device_put(jax.random.PRNGKey(0),
                         mesh_lib.replicated_sharding(mesh))

    # Warmup (compile + first steps).
    for _ in range(3):
        state, metrics = step_fn(state, pool, rng)
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, pool, rng)
    jax.block_until_ready(state.params)
    elapsed = time.perf_counter() - t0

    pairs_per_sec_per_chip = batch * steps / elapsed / num_chips
    print(json.dumps({
        'metric': 'zeng_bihome_train_throughput',
        'value': round(pairs_per_sec_per_chip, 2),
        'unit': 'pairs/s/chip',
        'vs_baseline': round(
            pairs_per_sec_per_chip / BASELINE_PAIRS_PER_SEC_PER_CHIP, 4),
    }))
    return 0


if __name__ == '__main__':
    sys.exit(main())
