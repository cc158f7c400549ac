#!/usr/bin/env python3
"""Eval CLI — MACE benchmark over the test split (ref: eval.py:516-528).

    python3 eval.py --config_file X.yaml [--ckpt DIR_OR_STEP]
                    [--batch_size N] [--vis] [--log mace.log]

Prints parameter count, "Mean mace" and "Mean model time" exactly like the
reference (ref: eval.py:334-341). Timing uses block_until_ready around the
jitted predict step (the CUDA-events equivalent), first iteration dropped.
"""

import argparse
import os
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

import jax
import numpy as np

jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

# The axon TPU plugin registers itself regardless of JAX_PLATFORMS; honor
# the env var explicitly so CPU-forced runs (tests, smoke) stay off the TPU.
if os.environ.get('JAX_PLATFORMS'):
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])


import jax.numpy as jnp

from bihome_tpu import config as config_lib
from bihome_tpu import geometry
from bihome_tpu.data import datasets, pipeline
from bihome_tpu.ops import color
from bihome_tpu.parallel import dist_util
from bihome_tpu.training import checkpoint as ckpt_lib
from bihome_tpu.training import trainer as trainer_lib
from bihome_tpu.training import train_state as ts_lib


def count_params(params) -> int:
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(params))


def save_visualization(out_dir, it, batch_size, vis_batch):
    """Reference-parity eval dumps, one artifact set PER SAMPLE of the
    iteration (artifact index = it*batch_size + idx, ref: eval.py:145-332):

      * {n}_image_vis.png — image_2 with gt (blue, corners - delta_gt) and
        predicted (red, corners - delta_hat) corner rectangles
        (ref: eval.py:200-219),
      * {n}_patch_1_2_mask.gif — 3 frames: patch_1 warped by delta_hat,
        patch_2, warped mask (ref: eval.py:245-273; for mask-less models the
        closed-form warp-support mask stands in for the model mask — the
        reference errors there),
      * {n}_warped.npy / {n}_patch_2.npy / {n}_mask_1.npy / {n}_mask_2.npy
        (+ {n}_pf.npy when the model predicts a perspective field),
        ref: eval.py:275-289.

    ``vis_batch``: dict of numpy arrays prepared on device by the caller
    (destandardized warps happen batched; only PNG/GIF encode runs here).
    """
    from PIL import Image
    from bihome_tpu.utils import visualization as vis
    os.makedirs(out_dir, exist_ok=True)

    def to_u8(img):
        arr = np.asarray(color.destandardize(jnp.asarray(img)))
        return np.tile(arr.astype(np.uint8), (1, 1, 3))

    for idx in range(batch_size):
        n = it * batch_size + idx
        warped = vis_batch['warped'][idx]
        patch_2 = vis_batch['patch_2'][idx]
        mask_1_w = vis_batch['mask_1_warped'][idx]
        vis.save_gif(
            os.path.join(out_dir, f'{n:05d}_patch_1_2_mask.gif'),
            [to_u8(warped), to_u8(patch_2),
             np.tile((np.clip(mask_1_w, 0, 1) * 255).astype(np.uint8),
                     (1, 1, 3))])
        np.save(os.path.join(out_dir, f'{n:05d}_warped.npy'), warped)
        np.save(os.path.join(out_dir, f'{n:05d}_patch_2.npy'), patch_2)
        np.save(os.path.join(out_dir, f'{n:05d}_mask_1.npy'), mask_1_w)
        np.save(os.path.join(out_dir, f'{n:05d}_mask_2.npy'),
                vis_batch['mask_2'][idx])
        if 'pf' in vis_batch:
            np.save(os.path.join(out_dir, f'{n:05d}_pf.npy'),
                    vis_batch['pf'][idx])
        if 'image_2' in vis_batch:
            img2 = np.clip(vis_batch['image_2'][idx], 0, 255).astype(np.uint8)
            if img2.shape[-1] == 1:
                img2 = np.tile(img2, (1, 1, 3))
            corners = vis_batch['corners'][idx]
            img2 = vis.draw_rect(img2, corners - vis_batch['delta'][idx], 'b')
            img2 = vis.draw_rect(
                img2, corners - vis_batch['delta_hat'][idx], 'r')
            Image.fromarray(img2).save(
                os.path.join(out_dir, f'{n:05d}_image_vis.png'))


def main(args):
    config = config_lib.load_config(args.config_file)
    config_lib.apply_overrides(config, args.set)
    data_cfg = config['DATA']
    sampler_cfg = data_cfg['SAMPLER']
    np.random.seed(sampler_cfg.get('TEST_SEED', 42))   # ref: eval.py:360

    batch_size = args.batch_size
    test_samples = sampler_cfg['TEST_SAMPLES_PER_EPOCH']
    if args.steps:
        test_samples = min(test_samples, args.steps * batch_size)

    built = config_lib.build_model(config)
    if args.vis:
        import dataclasses
        built.test_pair_spec = dataclasses.replace(
            built.test_pair_spec,
            emit_images=tuple(set(built.test_pair_spec.emit_images)
                              | {'image_2'}))
    tx, _ = ts_lib.make_optimizer(**config_lib.solver_kwargs(config))

    ds = (datasets.SyntheticDataset(image_size=tuple(args.image_size), seed=1)
          if args.synthetic else
          datasets.make_dataset(data_cfg.get('TEST_SPLIT', ''),
                                image_size=tuple(args.image_size),
                                synthetic_seed=1,
                                dataset_name=data_cfg.get('NAME', 'coco')))
    if built.test_pair_spec.host_prep:
        ds = datasets.HostPrepDataset(ds, built.test_pair_spec.host_prep,
                                      random_seed=sampler_cfg.get('TEST_SEED'))
    loader = datasets.BatchLoader(ds, batch_size, test_samples,
                                  random_seed=sampler_cfg.get('TEST_SEED'))

    sample = np.stack([ds.load_image(0)] * batch_size)
    variables = trainer_lib.init_model(built, sample)
    state = ts_lib.create_train_state(variables, tx)
    if args.torch_ckpt:
        from bihome_tpu.models import torch_port
        data = torch_port.load_torch_state_dict(args.torch_ckpt,
                                                full_checkpoint=True)
        new_vars, step = torch_port.port_reference_checkpoint(
            data, config, {'params': state.params,
                           'batch_stats': state.batch_stats})
        state = state.replace(params=new_vars['params'],
                              batch_stats=new_vars['batch_stats'])
        print(f'Loaded reference torch checkpoint step {step} '
              f'from {args.torch_ckpt}')
    elif args.ckpt:
        state, step = ckpt_lib.load_weights_only(args.ckpt, state)
        print(f'Loaded checkpoint step {step} from {args.ckpt}')
    else:
        log_dir = config['LOGGING']['DIR']
        if os.path.isdir(log_dir):
            state, step = ckpt_lib.load_weights_only(log_dir, state)
            if step:
                print(f'Loaded latest checkpoint step {step}')

    test_seed = sampler_cfg.get('TEST_SEED', 42)

    # Reference protocol (ref: eval.py:360,392-407): seeded epoch indices
    # over the REAL test split (with replacement, DatasetSampler semantics),
    # TEST_SAMPLES_PER_EPOCH samples, per-sample datagen keyed by sample
    # ordinal — so MACE is identical for any --batch_size at a fixed seed.
    # The whole evaluation still runs as scanned dispatches over a
    # device-resident image array: per-iteration dispatches cost seconds
    # over the TPU tunnel (see BENCH_NOTES.md), which would make 2304
    # batch-1 iterations take tens of minutes.
    num_iters = test_samples // batch_size
    n_eval = num_iters * batch_size
    indices = datasets.EpochSampler(len(ds), n_eval,
                                    random_seed=test_seed).epoch_indices()
    uniq, inv = np.unique(indices, return_inverse=True)
    pool = jnp.asarray(np.stack([ds.load_image(int(i)) for i in uniq]))
    sample_to_pool = jnp.asarray(inv.reshape(num_iters, batch_size))
    spec = built.test_pair_spec
    base_key = jax.random.PRNGKey(test_seed)

    def gen_batch(pool, it):
        ordinals = it * batch_size + jnp.arange(batch_size)
        keys = jax.vmap(lambda o: jax.random.fold_in(base_key, o))(ordinals)
        images = pipeline.take_images(pool, sample_to_pool[it])
        return pipeline.generate_pairs_per_sample(images, keys, spec)

    predict_fn = trainer_lib.make_predict_step(built)

    @jax.jit
    def eval_all(state, pool):
        def one(it):
            batch = gen_batch(pool, it)
            delta_hat, _ = predict_fn(
                state, batch, jax.random.fold_in(
                    jax.random.PRNGKey(test_seed + 1), it))
            diff = (batch['delta'].reshape(batch_size, -1, 2)
                    - delta_hat.reshape(batch_size, -1, 2))
            return jnp.mean(jnp.linalg.norm(diff, axis=-1), axis=-1)  # [B]
        return jax.lax.map(one, jnp.arange(num_iters))

    @jax.jit
    def datagen_all(pool):
        def one(it):
            batch = gen_batch(pool, it)
            return {k: batch[k] for k in ('patch_1', 'patch_2', 'corners',
                                          'delta')}
        return jax.lax.map(one, jnp.arange(num_iters))

    @jax.jit
    def predict_timed(state, batches, salt):
        """Predict-only loop over pre-generated batches ("Mean model time"
        excludes data prep, ref: eval.py:83-112). ``salt`` chains a data
        dependency so the memoizing TPU runtime can't replay a previous
        run's result (see BENCH_NOTES.md)."""
        def body(carry, batch):
            batch = dict(batch)
            batch['patch_1'] = batch['patch_1'] + carry * 1e-30
            delta_hat, _ = predict_fn(state, batch,
                                      jax.random.PRNGKey(test_seed + 1))
            return jnp.sum(delta_hat) * 1e-30, delta_hat
        _, out = jax.lax.scan(body, salt, batches)
        return out

    maces = np.asarray(jax.block_until_ready(
        eval_all(state, pool))).reshape(-1)                    # per sample
    # Multi-host: gather each host's per-sample maces before reducing
    # (process_allgather replaces the reference's pickle all_gather,
    # ref: src/utils/dist_util.py:59-96; no-op on a single host).
    if dist_util.get_world_size() > 1:
        maces = np.concatenate(
            [np.asarray(m).reshape(-1) for m in dist_util.all_gather(maces)])

    per_batch_ms = float('nan')
    if not args.skip_timing:
        # Timing: pre-generate all batches, then time predict only.
        batches = jax.block_until_ready(datagen_all(pool))
        predict_timed(state, batches, jnp.float32(0.0))        # warmup
        start = time.perf_counter()
        jax.block_until_ready(
            predict_timed(state, batches, jnp.float32(1e-30)))
        per_batch_ms = (time.perf_counter() - start) / num_iters * 1000.0

    if args.log and dist_util.is_main_process():
        # Per-sample CSV "iter,mace" (ref: eval.py:136-138; iteration ==
        # sample at the reference's default batch 1).
        with open(args.log, 'a') as f:
            for it, m in enumerate(maces):
                f.write(f'{it},{float(m)}\n')
    if args.vis:
        # Full-parity dumps over EVERY eval iteration (ref: eval.py:145-332).
        # The warps/masks are computed batched on device; the host only
        # encodes PNG/GIF/npy.
        mask_keys = built.head_cfg.mask_keys
        pf_key = built.head_cfg.pf_keys[0] if built.head_cfg.pf_keys else None

        @jax.jit
        def vis_outputs(state, pool, it):
            batch = gen_batch(pool, it)
            delta_hat, _ = predict_fn(
                state, batch, jax.random.fold_in(
                    jax.random.PRNGKey(test_seed + 1), it))
            ps = batch['patch_1'].shape[1]
            corners_local = geometry.image_corners(
                ps, ps, batch_size=batch_size)
            h = geometry.four_point_to_homography(corners_local, delta_hat)
            u, v = geometry.homography_grid(h, (ps, ps))
            out = {
                'warped': geometry.batched_sample(
                    batch['patch_1'], u, v).reshape(batch['patch_1'].shape),
                'mask_1_warped': geometry.ones_warp_mask(
                    u, v, (ps, ps)).reshape(batch_size, ps, ps, 1),
                'mask_2': jnp.ones_like(batch['patch_1']),
                'patch_2': batch['patch_2'],
                'corners': batch['corners'], 'delta': batch['delta'],
                'delta_hat': delta_hat,
            }
            if 'image_2' in batch:
                out['image_2'] = batch['image_2']
            if mask_keys or pf_key:
                bb_vars = {'params': state.params['backbone']}
                if state.batch_stats and 'backbone' in state.batch_stats:
                    bb_vars['batch_stats'] = state.batch_stats['backbone']
                bb_out = built.model.backbone.apply(bb_vars, batch,
                                                    train=False)
                if mask_keys:
                    # Model mask warped by the prediction (ref: eval.py:272).
                    m1 = bb_out[mask_keys[0]]
                    out['mask_1_warped'] = geometry.batched_sample(
                        m1, u, v).reshape(m1.shape)
                    out['mask_2'] = bb_out[mask_keys[1]]
                if pf_key is not None:
                    out['pf'] = bb_out[pf_key]
            return out

        for it in range(num_iters):
            vis_batch = jax.tree_util.tree_map(
                np.asarray, vis_outputs(state, pool, it))
            save_visualization(args.vis_dir, it, batch_size, vis_batch)
        print(f'Visualization artifacts for {n_eval} samples written '
              f'to {args.vis_dir}')

    if dist_util.is_main_process():
        print('Number of params: {}'.format(count_params(state.params)))
        print('Mean mace: {}'.format(float(np.mean(maces))))
        if not args.skip_timing:
            print('Mean model time: {}'.format(per_batch_ms))


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--config_file', type=str, required=True)
    parser.add_argument('--ckpt', type=str, default='')
    parser.add_argument('--torch_ckpt', type=str, default='',
                        help='Load a reference .pth training checkpoint '
                             '(nn.Sequential(backbone, head) state_dict).')
    parser.add_argument('--batch_size', type=int, default=1)
    parser.add_argument('--vis', action='store_true')
    parser.add_argument('--vis_dir', type=str, default='vis_out')
    parser.add_argument('--log', type=str, default='')
    parser.add_argument('--synthetic', action='store_true')
    parser.add_argument('--skip_timing', action='store_true',
                        help='skip the "Mean model time" loop (MACE only; '
                             'framework extension for knob sweeps)')
    parser.add_argument('--steps', type=int, default=0)
    parser.add_argument('--image_size', type=int, nargs=2,
                        default=(320, 240))
    parser.add_argument('--set', action='append', default=[],
                        metavar='KEY=VALUE',
                        help='dotted config override, e.g. '
                             'MODEL.HEAD.AUXILIARY_RESNET_PATH=aux.npz')
    parser.add_argument('--multihost', action='store_true',
                        help='initialize the JAX distributed runtime '
                             '(multi-host pod execution; per-sample maces '
                             'are process_allgather-reduced to rank 0)')
    _args = parser.parse_args()
    if _args.multihost:
        import jax
        jax.distributed.initialize()
    main(_args)
