#!/usr/bin/env python3
"""Latency benchmark for an exported serving artifact (bihome_tpu/serving.py).

    python tools/bench_serving.py --artifact model.shlo [--batch 64]
        [--iters 50] [--json]

Loads the StableHLO artifact on THIS process's platform (TPU under axon,
CPU with JAX_PLATFORMS=cpu) and reports steady-state predict latency.

Measurement notes:
  * The axon TPU runtime memoizes executions with identical inputs, so the
    loop chains a data dependency — each iteration's input is perturbed by
    the previous iteration's output (see BENCH_NOTES.md "MEASUREMENT
    GOTCHA").
  * Timing covers the artifact call only (inputs stay on device), matching
    the reference's model-only timing discipline (ref: eval.py:83-112).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
if os.environ.get('JAX_PLATFORMS'):
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

import jax.numpy as jnp
import numpy as np

from bihome_tpu import serving


def main(args):
    shapes = serving.exported_input_shapes(args.artifact)
    (b, ps, _, ch), _ = shapes
    symbolic = not isinstance(b, int)
    if symbolic:
        if not args.batch:
            raise SystemExit('artifact is batch-polymorphic; pass --batch')
        b = args.batch
    elif args.batch and args.batch != b:
        raise SystemExit(f'artifact is fixed at batch {b}; --batch must '
                         f'match (got {args.batch})')
    predict = serving.load_exported(args.artifact)

    rng = np.random.RandomState(0)
    p1 = jnp.asarray(rng.randn(b, ps, ps, ch).astype(np.float32))
    p2 = jnp.asarray(rng.randn(b, ps, ps, ch).astype(np.float32))

    # Chained-dependency timing loop (memoization dodge): each iteration's
    # input depends on the previous delta_hat, so no two executions see
    # identical inputs and the runtime cannot replay a cached result.
    @jax.jit
    def chain(p, delta):
        return p + 1e-6 * jnp.mean(delta)

    delta = predict(p1, p2)
    for _ in range(args.warmup - 1):
        p1 = chain(p1, delta)
        delta = predict(p1, p2)
    jax.block_until_ready(delta)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        p1 = chain(p1, delta)
        delta = predict(p1, p2)
    jax.block_until_ready(delta)
    dt = time.perf_counter() - t0

    ms = dt / args.iters * 1e3
    pairs_s = b * args.iters / dt
    platform = jax.devices()[0].platform
    if args.json:
        print(json.dumps({'metric': 'serving_latency_ms', 'value': round(ms, 3),
                          'unit': 'ms/batch', 'batch': b,
                          'pairs_per_s': round(pairs_s, 1),
                          'platform': platform}))
    else:
        print(f'{args.artifact}: batch={b} platform={platform} '
              f'{ms:.3f} ms/batch  {pairs_s:,.0f} pairs/s '
              f'({args.iters} iters, {args.warmup} warmup)')
    return 0


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--artifact', type=str, required=True)
    parser.add_argument('--batch', type=int, default=0,
                        help='batch size (required for polymorphic artifacts)')
    parser.add_argument('--iters', type=int, default=50)
    parser.add_argument('--warmup', type=int, default=5)
    parser.add_argument('--json', action='store_true',
                        help='print one machine-readable JSON line')
    sys.exit(main(parser.parse_args()))
