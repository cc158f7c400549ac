#!/usr/bin/env python3
"""Self-supervised pretext training for the biHomE auxiliary extractor.

The biHomE loss is defined in the feature space of a FROZEN pretrained
resnet34 (ref: src/heads/PerceptualHead.py:21-39); the reference downloads
ImageNet weights. This environment has no network and no .pth files, so
this tool trains the conv1/bn1/layer1 stack (all biHomE uses at
AUXILIARY_RESNET_OUTPUT_LAYER=1) on a rotation-prediction pretext
(RotNet, Gidaris et al. 2018) over the synthetic image pool, and saves the
subtree as an .npz that train.py's HEAD.AUXILIARY_RESNET_PATH accepts.

    python tools/pretrain_aux.py --steps 1500 --out aux_rotnet.npz
"""

import argparse
import os
import sys

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
if os.environ.get('JAX_PLATFORMS'):
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bihome_tpu.data import pipeline, synthetic
from bihome_tpu.models.resnet import ResNet
from bihome_tpu.utils import aux_store


def main(args):
    model = ResNet(arch='resnet34', num_classes=4, dtype=jnp.bfloat16)
    spec = pipeline.PairSpec(rho=32, patch_size=128, photometric_keys=(),
                             max_delta=0.0)
    pool = jnp.asarray(synthetic.make_image_pool(args.pool, 240, 320,
                                                 seed=args.seed))

    def make_batch(key):
        k_idx, k_gen, k_rot = jax.random.split(key, 3)
        idx = jax.random.randint(k_idx, (args.batch,), 0, pool.shape[0])
        batch = pipeline.generate_pairs(pipeline.take_images(pool, idx),
                                        k_gen, spec)
        x = batch['patch_1']                                   # [B,128,128,1]
        rot = jax.random.randint(k_rot, (args.batch,), 0, 4)
        # rot90 by k: compose flips/transposes selected per sample.
        x90 = jnp.transpose(x[:, :, ::-1], (0, 2, 1, 3))
        x180 = x[:, ::-1, ::-1]
        x270 = jnp.transpose(x, (0, 2, 1, 3))[:, :, ::-1]
        stacked = jnp.stack([x, x90, x180, x270], axis=1)
        x = jnp.take_along_axis(
            stacked, rot[:, None, None, None, None], axis=1)[:, 0]
        return x, rot

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, 128, 128, 1)), train=False)
    tx = optax.adam(args.lr)
    opt_state = tx.init(variables['params'])

    def train_step(params, batch_stats, opt_state, key):
        x, rot = make_batch(key)

        def loss_fn(p):
            logits, mut = model.apply(
                {'params': p, 'batch_stats': batch_stats}, x, train=True,
                mutable=['batch_stats'])
            loss = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                logits, rot))
            acc = jnp.mean((jnp.argmax(logits, -1) == rot).astype(jnp.float32))
            return loss, (mut['batch_stats'], acc)

        (loss, (batch_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, batch_stats, opt_state, loss, acc

    @jax.jit
    def train_block(params, batch_stats, opt_state, key, base):
        def body(carry, i):
            params, batch_stats, opt_state = carry
            params, batch_stats, opt_state, loss, acc = train_step(
                params, batch_stats, opt_state,
                jax.random.fold_in(key, base + i))
            return (params, batch_stats, opt_state), (loss, acc)
        carry, (losses, accs) = jax.lax.scan(
            body, (params, batch_stats, opt_state), jnp.arange(args.unroll))
        return carry + (losses[-1], accs[-1])

    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    key = jax.random.PRNGKey(args.seed)
    for blk in range(args.steps // args.unroll):
        params, batch_stats, opt_state, loss, acc = train_block(
            params, batch_stats, opt_state, key, blk * args.unroll)
        if blk % 5 == 0:
            print(f'step {blk * args.unroll}: loss={float(loss):.4f} '
                  f'acc={float(acc):.3f}', flush=True)

    aux_store.save_aux_npz(args.out, {'params': jax.device_get(params),
                                      'batch_stats': jax.device_get(
                                          batch_stats)})
    print(f'Saved aux extractor (conv1/bn1/layer1) to {args.out}')


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--steps', type=int, default=1500)
    p.add_argument('--unroll', type=int, default=20)
    p.add_argument('--batch', type=int, default=256)
    p.add_argument('--pool', type=int, default=256)
    p.add_argument('--lr', type=float, default=1e-3)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--out', type=str, default='aux_rotnet.npz')
    main(p.parse_args())
