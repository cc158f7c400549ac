#!/usr/bin/env python3
"""Minimal-repro probe for the DSAC_PREDICT_REFINE_ITERS=2 axon fault.

BENCH_NOTES r4: the FULL eval graph with 2 IRLS refine rounds
deterministically aborts the axon backend ("TPU device error — often a
kernel fault"); iters math is value-pinned on CPU. This probe isolates
the refine op: jit ONLY dsac.refine_delta_on_pf at the flagship shapes
([B,128,128,2] PF, [B,4,2] deltas) and run iters=1..3 standalone.

  timeout 600 python tools/probe_refine_iters.py [batch]

Outcomes:
  * standalone iters=2 faults  -> minimal repro found; file it.
  * standalone iters=2 passes  -> the fault is an interaction with the
    larger eval graph; the split-jit eval path (predict without refine,
    host round-trip, refine as its own jit) is the workaround.
"""

import os
import sys

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])

import jax.numpy as jnp
import numpy as np

from bihome_tpu.heads import dsac


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    print(f'backend: {jax.default_backend()} ({jax.devices()[0]}), B={b}')
    rng = np.random.RandomState(0)
    pf = jnp.asarray(rng.randn(b, 128, 128, 2).astype(np.float32) * 2)
    delta = jnp.asarray(rng.randn(b, 4, 2).astype(np.float32) * 8)
    for iters in (1, 2, 3):
        fn = jax.jit(lambda pf, d, it=iters: dsac.refine_delta_on_pf(
            pf, d, 3.0, it))
        out = jax.block_until_ready(fn(pf, delta))
        # chain a data dependency so the memoizing runtime re-executes
        delta = out + 1e-3
        print(f'iters={iters}: OK, mean|delta|='
              f'{float(jnp.mean(jnp.abs(out))):.4f}')
    print('standalone refine survives all iters — fault is a full-graph '
          'interaction')


if __name__ == '__main__':
    main()
