#!/usr/bin/env python3
"""Dump the optimized HLO of the benched train block (for attribute_trace).

    python tools/dump_hlo.py [config.yaml] [out.txt] [batch] [unroll]

Compiles the exact same jit program bench.py times (pool-sampled fused
train step scanned `unroll` times) and writes `compiled.as_text()`. With a
warm JAX_COMPILATION_CACHE_DIR this is fast; a cold zeng compile through
the axon tunnel takes ~12 min (CLAUDE.md).
"""

import os
import sys

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp
import numpy as np

from bihome_tpu import config as config_lib
from bihome_tpu.data import pipeline, synthetic
from bihome_tpu.parallel import mesh as mesh_lib
from bihome_tpu.training import trainer as trainer_lib
from bihome_tpu.training import train_state as ts_lib


def main():
    cfg_path = sys.argv[1] if len(sys.argv) > 1 else (
        'config/pds-coco/zeng-bihome-lr-1e-3.yaml')
    out_path = sys.argv[2] if len(sys.argv) > 2 else '/tmp/zeng_hlo.txt'
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    unroll = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    config = config_lib.load_config(cfg_path)
    built = config_lib.build_model(config, dtype=jnp.bfloat16)
    tx, schedule = ts_lib.make_optimizer(**config_lib.solver_kwargs(config))
    mesh = mesh_lib.make_mesh()
    pool = jnp.asarray(synthetic.make_image_pool(max(batch, 64), 240, 320,
                                                 seed=7))
    sample = np.asarray(pool[:batch])
    variables = trainer_lib.init_model(built, sample)
    state = ts_lib.create_train_state(variables, tx)
    raw_step = trainer_lib.make_train_step(built, tx, schedule)

    def bench_block(state, pool, rng):
        def body(st, k):
            idx_key = jax.random.fold_in(jax.random.fold_in(rng, 1),
                                         st.step)
            idx = jax.random.randint(idx_key, (batch,), 0, pool.shape[0])
            images = pipeline.take_images(pool, idx)
            return raw_step(st, images, rng)[0], ()

        state, _ = jax.lax.scan(body, state, jnp.arange(unroll))
        return state

    lowered = jax.jit(bench_block, donate_argnums=(0,)).lower(
        state, pool, jax.random.PRNGKey(0))
    txt = lowered.compile().as_text()
    with open(out_path, 'w') as f:
        f.write(txt)
    print(f'wrote {len(txt) / 1e6:.1f} MB of optimized HLO to {out_path}')


if __name__ == '__main__':
    main()
