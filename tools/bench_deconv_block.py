#!/usr/bin/env python3
"""Microbench ResNet50DeconvBlock fwd+bwd variants at zeng decoder-tail
shapes on the real chip.

    python tools/bench_deconv_block.py [iters]

Variants (env-selected inside the block / fused op):
  unfused          BIHOME_DECONV_FUSE=off  (stock two-op composition)
  phase            fused, phase-conv fwd + conv-pair custom bwd (default)
  ct               fused, BIHOME_DC_FWD=ct (direct k4/s2 dilated conv fwd)
  phase-xlabwd     fused, BIHOME_DC_BWD=xla (stock autodiff backward)

Chains the input through each iteration (x += eps*dx) to defeat the axon
runtime's memoization of identical executions. Shapes: layer7 deconv
[2B=128, 64, 64, 32] and layer6 [128, 32, 32, 64] (batch-64 zeng,
doubleline stack).
"""

import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    'unfused': {'BIHOME_DECONV_FUSE': 'off'},
    'phase': {},
    'ct': {'BIHOME_DC_FWD': 'ct'},
    'phase-xlabwd': {'BIHOME_DC_BWD': 'xla'},
}
_KEYS = ('BIHOME_DECONV_FUSE', 'BIHOME_DC_FWD', 'BIHOME_DC_BWD')


def bench(shape, iters):
    from bihome_tpu.models.blocks import ResNet50DeconvBlock
    block = ResNet50DeconvBlock(dtype=jnp.bfloat16)
    x0 = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    results = {}
    for name, env in VARIANTS.items():
        for k in _KEYS:
            os.environ.pop(k, None)
        os.environ.update(env)
        variables = block.init(jax.random.PRNGKey(1), x0, train=True)

        @jax.jit
        def step(x):
            def loss(params, x):
                y, _ = block.apply(
                    {'params': params,
                     'batch_stats': variables['batch_stats']},
                    x, train=True, mutable=['batch_stats'])
                return jnp.sum(y * y)
            val, (dp, dx) = jax.value_and_grad(
                loss, argnums=(0, 1))(variables['params'], x)
            # chain: new x depends on this iteration's gradient
            return x + 1e-6 * dx.astype(x.dtype), val

        x = x0
        x, _ = step(x)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        for _ in range(iters):
            x, val = step(x)
        jax.block_until_ready(x)
        ms = (time.perf_counter() - t0) / iters * 1e3
        results[name] = ms
        print(f'  {name:14s} {ms:7.3f} ms/iter', flush=True)
    return results


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    print(f'backend: {jax.default_backend()} ({jax.devices()[0]})')
    for shape in ((128, 64, 64, 32), (128, 32, 32, 64)):
        print(f'shape {shape} (fwd+bwd through BNs, bf16):')
        bench(shape, iters)
    return 0


if __name__ == '__main__':
    sys.exit(main())
