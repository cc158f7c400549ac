#!/usr/bin/env python3
"""Benchmark: training throughput (pairs/sec/chip) on TPU.

Runs tracked configs' fused train step (on-device datagen + forward +
loss + backward + Adam) on synthetic 320x240 source images and reports
sustained throughput against the BASELINE.json target of 10,000 128x128
image-pairs/sec/chip on TPU v5e.

By default ALL FOUR tracked config families run every time
(BASELINE.md "Tracked configs"): the flagship zeng-biHomE (Rethinking
DoubleLine + DSAC + biHomE, batch 64) first, then zhang-orig (ContentAware
+ TripletHead) and nguyen-orig (PhotometricHead), then the headline
detone-orig (DeTone supervised, batch 128) LAST — the driver parses the
final JSON line, and the other lines stay visible in the tail so
regressions are driver-visible. BENCH_FAST=1 restores the two-config
(zeng+detone) sweep.

Prints one JSON line per config; the last line is the headline:
  {"metric": ..., "value": N, "unit": "pairs/s/chip", "vs_baseline": N/10000}

Env knobs: BENCH_CONFIG (run only that config), BENCH_BATCH, BENCH_STEPS
(timed dispatches), BENCH_UNROLL (steps per dispatch), BENCH_DTYPE,
BENCH_SEED.
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

# The axon TPU plugin registers itself regardless of JAX_PLATFORMS; honor
# the env var explicitly so CPU-forced runs (tests, smoke) stay off the TPU.
if os.environ.get('JAX_PLATFORMS'):
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])


import jax.numpy as jnp
import numpy as np

from bihome_tpu import config as config_lib
from bihome_tpu.data import pipeline, synthetic
from bihome_tpu.parallel import mesh as mesh_lib
from bihome_tpu.training import trainer as trainer_lib
from bihome_tpu.training import train_state as ts_lib

BASELINE_PAIRS_PER_SEC_PER_CHIP = 10_000.0


def bench_config(config_path: str, batch: int, steps: int, unroll: int,
                 dtype, seed: int) -> dict:
    config = config_lib.load_config(config_path)
    built = config_lib.build_model(config, dtype=dtype)
    tx, schedule = ts_lib.make_optimizer(**config_lib.solver_kwargs(config))

    num_chips = len(jax.devices())
    mesh = mesh_lib.make_mesh()

    # Device-resident synthetic source pool; per-step batch gathered by
    # index on device (the input pipeline streams uint8 from host in real
    # training; datagen itself is the benchmarked on-device path).
    # Pool seed is randomized per run: the TPU runtime memoizes identical
    # executions ACROSS PROCESSES, so a repeated bench with identical data
    # would replay cached results at fake speed (BENCH_SEED pins it).
    pool = jnp.asarray(synthetic.make_image_pool(max(batch, 64), 240, 320,
                                                 seed=seed))
    pool = jax.device_put(pool, mesh_lib.replicated_sharding(mesh))

    sample = np.asarray(pool[:batch])
    variables = trainer_lib.init_model(built, sample)
    state = ts_lib.create_train_state(variables, tx)
    state = jax.device_put(state, mesh_lib.replicated_sharding(mesh))

    # K steps per dispatch: amortizes host enqueue of the state pytree
    # (the single-step path is host-bound on slow hosts).
    raw_step = trainer_lib.make_train_step(built, tx, schedule)

    def bench_block(state, pool, rng):
        def body(st, k):
            idx_key = jax.random.fold_in(jax.random.fold_in(rng, 1), st.step)
            idx = jax.random.randint(idx_key, (batch,), 0, pool.shape[0])
            images = pipeline.take_images(pool, idx)
            return raw_step(st, images, rng)[0], ()

        state, _ = jax.lax.scan(body, state, jnp.arange(unroll))
        return state

    step_fn = jax.jit(bench_block, donate_argnums=(0,))
    rng = jax.device_put(jax.random.PRNGKey(0),
                         mesh_lib.replicated_sharding(mesh))

    # Warmup (compile + first steps).
    state = step_fn(state, pool, rng)
    jax.block_until_ready(state.params)

    # BENCH_PROFILE=<dir>: capture a profiler trace of one timed dispatch
    # (tensorboard-viewable; parse the .trace.json.gz top ops for the
    # per-op step breakdown).
    if os.environ.get('BENCH_PROFILE'):
        prof_dir = os.environ['BENCH_PROFILE']
        # Write the optimized HLO of the exact profiled executable next to
        # the trace: tools/attribute_trace.py joins trace op names with HLO
        # op_name metadata, and instruction numbering differs across
        # compiles — the pair must come from the same process.
        txt = step_fn.lower(state, pool, rng).compile().as_text()
        os.makedirs(prof_dir, exist_ok=True)
        with open(os.path.join(prof_dir, 'hlo.txt'), 'w') as f:
            f.write(txt)
        with jax.profiler.trace(prof_dir):
            state = step_fn(state, pool, rng)
            jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for _ in range(steps):
        state = step_fn(state, pool, rng)
    jax.block_until_ready(state.params)
    elapsed = time.perf_counter() - t0

    pairs_per_sec_per_chip = batch * steps * unroll / elapsed / num_chips
    run_name = os.path.basename(config_path).rsplit('.', 1)[0]
    return {
        'metric': f'{run_name}_train_throughput',
        'value': round(pairs_per_sec_per_chip, 2),
        'unit': 'pairs/s/chip',
        'vs_baseline': round(
            pairs_per_sec_per_chip / BASELINE_PAIRS_PER_SEC_PER_CHIP, 4),
    }


def main():
    steps = int(os.environ.get('BENCH_STEPS', '10'))
    unroll = int(os.environ.get('BENCH_UNROLL', '10'))
    dtype = {'bfloat16': jnp.bfloat16, 'float32': jnp.float32}[
        os.environ.get('BENCH_DTYPE', 'bfloat16')]
    seed = int(os.environ.get('BENCH_SEED',
                              str(int.from_bytes(os.urandom(2), 'big'))))

    if os.environ.get('BENCH_CONFIG'):
        runs = [(os.environ['BENCH_CONFIG'],
                 int(os.environ.get('BENCH_BATCH', '128')))]
    else:
        runs = [
            ('config/pds-coco/zeng-bihome-lr-1e-3.yaml',
             int(os.environ.get('BENCH_BATCH', '64'))),
        ]
        if not os.environ.get('BENCH_FAST'):
            runs += [
                ('config/pds-coco/zhang-orig-lr-1e-2.yaml',
                 int(os.environ.get('BENCH_BATCH', '64'))),
                # nguyen batch 128 like the detone headline: at batch 64
                # the ResNet34 step is launch-floor-bound (~300 ops x
                # ~45us; BENCH_NOTES r4 roofline), not hardware-bound —
                # 128 amortizes the floor. 64 -> 8,717; 128 -> 10,251.
                ('config/pds-coco/nguyen-orig-lr-5e-3.yaml',
                 int(os.environ.get('BENCH_BATCH', '128'))),
            ]
        # Headline LAST: the driver parses the final line.
        runs += [
            ('config/pds-coco/detone-orig-lr-5e-3.yaml',
             int(os.environ.get('BENCH_BATCH', '128'))),
        ]
    for config_path, batch in runs:
        print(json.dumps(bench_config(config_path, batch, steps, unroll,
                                      dtype, seed)), flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
