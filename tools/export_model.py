#!/usr/bin/env python3
"""Export a trained checkpoint as a self-contained StableHLO serving
artifact (see bihome_tpu/serving.py).

    python tools/export_model.py --config_file config/...yaml \
        [--ckpt LOGDIR_OR_STEP] [--set K=V ...] \
        [--batch_size N|b] [--platforms cpu tpu] [--check] --out model.shlo

``--batch_size b`` (any non-integer name) exports a batch-polymorphic
artifact: one trace, any leading batch dimension at call time.

The artifact embeds the weights; serve it from any JAX process with:

    from bihome_tpu import serving
    predict = serving.load_exported('model.shlo')
    delta_hat = predict(patch_1, patch_2)

--check deserializes the written file and verifies its output matches the
live model on a random input (on this process's platform).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
if os.environ.get('JAX_PLATFORMS'):
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

import numpy as np

from bihome_tpu import config as config_lib
from bihome_tpu import serving
from bihome_tpu.data import datasets
from bihome_tpu.training import checkpoint as ckpt_lib
from bihome_tpu.training import trainer as trainer_lib
from bihome_tpu.training import train_state as ts_lib


def main(args):
    config = config_lib.load_config(args.config_file)
    config_lib.apply_overrides(config, args.set)
    built = config_lib.build_model(config)
    tx, _ = ts_lib.make_optimizer(**config_lib.solver_kwargs(config))

    # --batch_size is an int, or a symbolic dim name (e.g. 'b') for a
    # batch-polymorphic artifact; concrete work below uses `check_batch`.
    symbolic = not args.batch_size.lstrip('-').isdigit()
    batch_size = args.batch_size if symbolic else int(args.batch_size)
    check_batch = 4 if symbolic else max(int(args.batch_size), 1)

    ds = datasets.SyntheticDataset(image_size=(320, 240), seed=1)
    sample = np.stack([ds.load_image(0)] * check_batch)
    variables = trainer_lib.init_model(built, sample)
    state = ts_lib.create_train_state(variables, tx)

    ckpt = args.ckpt or config['LOGGING']['DIR']
    if os.path.isdir(ckpt):
        state, step = ckpt_lib.load_weights_only(ckpt, state)
        print(f'Loaded checkpoint step {step} from {ckpt}')
    elif args.ckpt:
        raise SystemExit(f'--ckpt {args.ckpt}: no such checkpoint dir')
    else:
        print('WARNING: no checkpoint found; exporting random init')

    exp = serving.export_predict(built, state, batch_size=batch_size,
                                 platforms=args.platforms,
                                 rng_seed=args.rng_seed)
    serving.save_exported(exp, args.out)
    size_mb = os.path.getsize(args.out) / 1e6
    print(f'Exported {args.out}: platforms={list(args.platforms)}, '
          f'inputs={[tuple(a.shape) for a in exp.in_avals]}, '
          f'{size_mb:.1f} MB')

    if args.check:
        # Compare on an in-distribution datagen batch (on noise inputs the
        # PF is meaningless and the DSAC DLT solve ill-conditioned), against
        # a live model traced with the SAME PF-head composition the artifact
        # used: TPU f32 matmuls round through bf16 MXU passes at default
        # precision, so the fused and portable compositions legitimately
        # differ at bf16-epsilon scale (amplified ~1px through DSAC) — the
        # check verifies serialization fidelity, not composition numerics.
        import jax.numpy as jnp
        from bihome_tpu.data import pipeline
        predict = serving.load_exported(args.out)
        if 'cpu' in args.platforms:
            os.environ['BIHOME_PF_HEAD'] = 'ref'
        serve, _ = serving.make_serving_fn(built, state, check_batch,
                                           rng_seed=args.rng_seed)
        pool = jnp.asarray(np.stack(
            [ds.load_image(i) for i in range(check_batch)]))
        batch = jax.jit(pipeline.generate_pairs, static_argnums=2)(
            pool, jax.random.PRNGKey(0), built.test_pair_spec)
        p1 = np.asarray(batch['patch_1'], np.float32)
        p2 = np.asarray(batch['patch_2'], np.float32)
        got = np.asarray(predict(p1, p2))
        want = np.asarray(jax.jit(serve)(p1, p2))
        err = float(np.max(np.abs(got - want)))
        print(f'check: max |exported - live| = {err:.3e} '
              f'(delta scale ~{float(np.mean(np.abs(want))):.2f} px)')
        assert err < 1e-3, 'exported artifact diverges from live model'
    return 0


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--config_file', type=str, required=True)
    parser.add_argument('--ckpt', type=str, default='')
    parser.add_argument('--out', type=str, default='model.shlo')
    parser.add_argument('--batch_size', type=str, default='1',
                        help="int, or a symbolic dim name (e.g. 'b') for a "
                             'batch-polymorphic artifact')
    parser.add_argument('--platforms', type=str, nargs='+',
                        default=['cpu', 'tpu'])
    parser.add_argument('--rng_seed', type=int, default=0)
    parser.add_argument('--check', action='store_true')
    parser.add_argument('--set', action='append', default=[],
                        metavar='KEY=VALUE')
    sys.exit(main(parser.parse_args()))
