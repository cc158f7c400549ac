#!/usr/bin/env python3
"""Train CLI — reads the UNCHANGED reference YAML configs.

Usage (ref: train.py:760-768):
    python3 train.py --config_file config/pds-coco/zeng-bihome-lr-1e-3.yaml

Framework extensions for smoke/bench runs (ignored by reference configs):
    --synthetic          force the synthetic image pool even if data exists
    --steps N            cap steps per epoch
    --epochs N           override SOLVER.NUM_EPOCHS
    --batch_size N       override DATA.SAMPLER.BATCH_SIZE
    --image_size W H     source image size (default 320 240)
"""

import argparse
import os
import time

# Enable the persistent compile cache before jax initializes.
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


from bihome_tpu import config as config_lib
from bihome_tpu.data import datasets
from bihome_tpu.parallel import mesh as mesh_lib
from bihome_tpu.training import checkpoint as ckpt_lib
from bihome_tpu.training import metrics as metrics_lib
from bihome_tpu.training import trainer as trainer_lib
from bihome_tpu.training import train_state as ts_lib


def main(args):
    config = config_lib.load_config(args.config_file)
    config_lib.apply_overrides(config, args.set)
    if args.lr:
        config['SOLVER']['LR'] = args.lr
    if args.dtype:
        config['MODEL']['DTYPE'] = args.dtype
    data_cfg = config['DATA']
    sampler_cfg = data_cfg['SAMPLER']
    solver_cfg = config['SOLVER']
    log_cfg = config['LOGGING']

    batch_size = args.batch_size or sampler_cfg['BATCH_SIZE']
    epochs = args.epochs or solver_cfg['NUM_EPOCHS']
    steps_per_epoch = sampler_cfg['TRAIN_SAMPLES_PER_EPOCH'] // batch_size
    if args.steps:
        steps_per_epoch = min(steps_per_epoch, args.steps)
    test_steps = sampler_cfg['TEST_SAMPLES_PER_EPOCH'] // batch_size
    if args.steps:
        test_steps = min(test_steps, args.steps)
    image_size = tuple(args.image_size)

    # ---------------- model (built first: data loading consults the
    # parsed pair specs, e.g. host_prep transform chains) ----------------
    built = config_lib.build_model(config)

    # ---------------- data ----------------
    def make_ds(split_key, seed):
        path = data_cfg.get(split_key, '')
        if args.synthetic:
            return datasets.SyntheticDataset(image_size=image_size,
                                             seed=seed)
        return datasets.make_dataset(path, image_size=image_size,
                                     synthetic_seed=seed,
                                     dataset_name=data_cfg.get('NAME',
                                                               'coco'))

    clevr = 'clevr_change' in str(data_cfg.get('NAME', ''))
    if clevr:
        # Real-pair flow (ref: train.py:140-188): (original, changed)
        # renders feed the model through ChangeAwarePrep instead of
        # synthetic homography pairs. Loaders yield [B,2,H,W,3].
        from bihome_tpu.data import clevr_change
        pair_mode = sampler_cfg.get('MODE', 'nsc')

        def make_clevr_ds(split_key, seed):
            if args.synthetic:
                return clevr_change.SyntheticChangeDataset(
                    image_size=image_size, seed=seed)
            return clevr_change.ClevrChangeDataset(
                data_cfg.get(split_key, ''), image_size=image_size)

        train_ds = make_clevr_ds('TRAIN_SPLIT', 0)
        test_ds = (make_clevr_ds('TEST_SPLIT', 1)
                   if 'TEST_SPLIT' in data_cfg else None)
        train_loader = clevr_change.ClevrPairLoader(
            train_ds, batch_size, steps_per_epoch * batch_size,
            mode=pair_mode, random_seed=sampler_cfg.get('TRAIN_SEED'))
        test_loader = (clevr_change.ClevrPairLoader(
            test_ds, batch_size, test_steps * batch_size, mode=pair_mode,
            random_seed=sampler_cfg.get('TEST_SEED'))
            if test_ds is not None and test_steps > 0 else None)
    else:
        train_ds = make_ds('TRAIN_SPLIT', 0)
        test_ds = (make_ds('TEST_SPLIT', 1)
                   if 'TEST_SPLIT' in data_cfg else None)
        # Host-side pre-datagen transforms from the config TRANSFORMS list
        # (Rescale/RandomCrop/CenterCrop/ToGrayscale/Standardize).
        if built.pair_spec.host_prep:
            train_ds = datasets.HostPrepDataset(
                train_ds, built.pair_spec.host_prep,
                random_seed=sampler_cfg.get('TRAIN_SEED'))
        if test_ds is not None and built.test_pair_spec.host_prep:
            test_ds = datasets.HostPrepDataset(
                test_ds, built.test_pair_spec.host_prep,
                random_seed=sampler_cfg.get('TEST_SEED'))

        def make_loader(ds, n_samples, seed):
            # .bhpk packs stream through the native C++ prefetch ring
            # (native/pack_reader.cc); everything else uses the Python
            # prefetch-thread loader.
            from bihome_tpu.data.pack import PackBatchLoader, PackDataset
            cls = (PackBatchLoader if isinstance(ds, PackDataset)
                   else datasets.BatchLoader)
            return cls(ds, batch_size, n_samples, random_seed=seed)

        train_loader = make_loader(train_ds, steps_per_epoch * batch_size,
                                   sampler_cfg.get('TRAIN_SEED'))
        test_loader = (make_loader(test_ds, test_steps * batch_size,
                                   sampler_cfg.get('TEST_SEED'))
                       if test_ds is not None and test_steps > 0 else None)

    # ---------------- optimizer ----------------
    tx, schedule = ts_lib.make_optimizer(
        frozen_prefixes=(('auxiliary_resnet',)
                         if built.head_cfg.auxiliary_resnet_freeze else ()),
        **config_lib.solver_kwargs(config))

    if clevr:
        sample = np.stack([train_loader._load_pair(0, len(train_ds))]
                          * batch_size)
    else:
        sample = np.stack([train_ds.load_image(0)] * batch_size)
    variables = trainer_lib.init_model(built, sample)
    variables = maybe_load_pretrained_resnets(built, variables, config)
    state = ts_lib.create_train_state(variables, tx)

    # ---------------- checkpoint / resume ----------------
    log_dir = log_cfg['DIR']
    checkpointer = ckpt_lib.CheckPointer(log_dir)
    restart_lr = bool(solver_cfg.get('RESTART_LEARNING_RATE', False))
    state, start_step = checkpointer.load(state,
                                          restart_learning_rate=restart_lr)
    if 'PRETRAINED' in config.get('MODEL', {}) and start_step == 0:
        state = ckpt_lib.load_pretrained_params(config['MODEL']['PRETRAINED'],
                                                state)
        print('Pretrained model loaded!')
    start_epoch = start_step // steps_per_epoch

    # ---------------- mesh / compile ----------------
    mesh = mesh_lib.make_mesh()
    print(f'Mesh: {mesh.shape} over {len(jax.devices())} device(s)')
    # Multiple steps per dispatch: each jit dispatch over the TPU tunnel
    # costs far more than the device compute of one step (see BENCH_NOTES),
    # so the loop scans K steps per call (K divides the logging interval).
    log_step = int(log_cfg.get('STEP', 100))
    spc = args.steps_per_call or trainer_lib.pick_steps_per_call(
        steps_per_epoch, log_step)
    print(f'steps_per_call: {spc}')
    rep = mesh_lib.replicated_sharding(mesh)
    feed = args.feed
    # --pool_shard: pool sharded along the 'data' axis; each device samples
    # from its own shard (zero-collective feed, pool HBM / ndev; on
    # multi-host each host uploads only its shard).
    ndev = len(jax.devices())
    pool_mesh = mesh if (args.pool_shard and ndev > 1) else None
    pool_sharding = (mesh_lib.batch_sharding(mesh) if pool_mesh is not None
                     else rep)
    if feed == 'pool':
        train_block = jax.jit(
            trainer_lib.make_pool_train_step(built, tx, schedule, spc,
                                             batch_size, mesh=pool_mesh),
            donate_argnums=(0,))
        eval_block = (jax.jit(trainer_lib.make_pool_eval_step(
            built, test_steps, batch_size)) if test_steps > 0 else None)
    else:
        train_block = jax.jit(
            trainer_lib.make_multi_train_step(built, tx, schedule, spc),
            donate_argnums=(0,))
        eval_block = (jax.jit(trainer_lib.make_multi_eval_step(
            built, test_steps)) if test_steps > 0 else None)

    state = jax.device_put(state, rep)
    train_rng = jax.device_put(
        jax.random.PRNGKey(sampler_cfg.get('TRAIN_SEED', 0) or 0), rep)
    eval_rng = jax.device_put(
        jax.random.PRNGKey(sampler_cfg.get('TEST_SEED', 0) or 0), rep)

    # Rank-0-only metrics (replicated values; ref gates TB the same way).
    writer = (metrics_lib.MetricsWriter(log_dir)
              if mesh_lib.is_main_process() else metrics_lib.NullWriter())
    verbose = bool(log_cfg.get('VERBOSE', False))
    last_log_time = [None]  # windowed rate: excludes compile time

    # ---------------- device image pools (feed='pool') ----------------
    if feed == 'pool':
        pool_size = min(args.pool_size, len(train_ds))
        if pool_mesh is not None:
            pool_size -= pool_size % ndev
        pool_sampler = datasets.EpochSampler(
            len(train_ds), pool_size,
            random_seed=sampler_cfg.get('TRAIN_SEED'))

        if clevr:
            def next_train_pool():
                return train_loader.pool(pool_size)
        else:
            def next_train_pool():
                return np.stack([train_ds.load_image(int(i))
                                 for i in pool_sampler.epoch_indices()])

        train_pool = jax.device_put(next_train_pool(), pool_sharding)
        dispatches_per_refresh = max(
            1, args.pool_refresh_steps // spc)
        if test_ds is not None and test_steps > 0:
            if clevr:
                test_pool = jax.device_put(
                    test_loader.pool(min(args.pool_size, len(test_ds))),
                    rep)
            else:
                test_sampler = datasets.EpochSampler(
                    len(test_ds), min(args.pool_size, len(test_ds)),
                    random_seed=sampler_cfg.get('TEST_SEED'))
                test_pool = jax.device_put(
                    np.stack([test_ds.load_image(int(i))
                              for i in test_sampler.epoch_indices()]), rep)

        # Background pool refresher: prepares the next host-side pool while
        # the device trains; the main loop uploads it between dispatches.
        import queue as _queue
        import threading as _threading
        next_pool_q: '_queue.Queue' = _queue.Queue(maxsize=1)

        def _refresher():
            while True:
                next_pool_q.put(next_train_pool())  # blocks until consumed

        if len(train_ds) > pool_size:
            _threading.Thread(target=_refresher, daemon=True).start()

    # ---------------- loop ----------------
    step = start_step
    dispatch_count = 0
    for epoch in range(start_epoch, epochs):
        print(f'Training epoch: {epoch}')
        t_epoch = time.time()

        def log_metrics(metrics):
            host = {k: float(v)
                    for k, v in jax.device_get(metrics).items()}
            now = time.time()
            if last_log_time[0] is not None:
                host['throughput/pairs_per_sec_per_chip'] = (
                    log_step * batch_size / (now - last_log_time[0])
                    / len(jax.devices()))
            last_log_time[0] = now
            writer.scalars(step, host)
            if verbose:
                print(f'Epoch: {epoch} step: {step} '
                      f'loss: {host["loss/train"]:.5f}')

        if feed == 'pool':
            for _ in range(steps_per_epoch // spc):
                if args.profile and dispatch_count == 2:
                    jax.profiler.start_trace(
                        os.path.join(log_dir, 'profile'))
                state, metrics = train_block(state, train_pool, train_rng)
                if args.profile and dispatch_count == 3:
                    jax.block_until_ready(metrics['loss/train'])
                    jax.profiler.stop_trace()
                    print(f'Profile trace written to {log_dir}/profile')
                step += spc
                dispatch_count += 1
                if step % log_step == 0:
                    log_metrics(metrics)
                if (dispatch_count % dispatches_per_refresh == 0
                        and not next_pool_q.empty()):
                    train_pool = jax.device_put(next_pool_q.get(),
                                                pool_sharding)
        else:
            chunk = []
            for images in train_loader.epoch():
                chunk.append(images)
                if len(chunk) < spc:
                    continue
                block = mesh_lib.shard_axis(mesh, np.stack(chunk), axis=1)
                chunk = []
                state, metrics = train_block(state, block, train_rng)
                step += spc
                if step % log_step == 0:
                    log_metrics(metrics)
        checkpointer.save(step, jax.device_get(state))
        print(f'Epoch {epoch} done in {time.time() - t_epoch:.1f}s')

        if test_loader is not None and eval_block is not None:
            print(f'Testing epoch: {epoch}')
            if feed == 'pool':
                m = jax.device_get(eval_block(state, test_pool, eval_rng))
            else:
                test_images = np.stack(list(test_loader.epoch()))
                test_dev = mesh_lib.shard_axis(mesh, test_images, axis=1)
                m = jax.device_get(eval_block(state, test_dev, eval_rng))
            writer.scalars((epoch + 1) * steps_per_epoch,
                           {k: float(v) for k, v in m.items()})
    writer.close()
    print('DONE!')


def maybe_load_pretrained_resnets(built, variables, config):
    """PRETRAINED_RESNET handling: the reference downloads torchvision
    ImageNet weights (ref: ResNet34.py:15, Rethinking.py:176-183,
    PerceptualHead.py:21-22). No network here — weights load from a local
    .pth named by MODEL.BACKBONE.PRETRAINED_RESNET_PATH /
    MODEL.HEAD.AUXILIARY_RESNET_PATH when present; otherwise the (documented)
    fallback is the kaiming init."""
    from bihome_tpu.models import torch_port
    backbone_cfg = config['MODEL']['BACKBONE']
    head_cfg = config['MODEL'].get('HEAD', {})
    path = backbone_cfg.get('PRETRAINED_RESNET_PATH')
    if backbone_cfg.get('PRETRAINED_RESNET') and path and os.path.exists(path):
        state = torch_port.load_torch_state_dict(path)
        if backbone_cfg['NAME'] == 'Rethinking':
            ported = torch_port.port_rethinking_encoder(state)
            variables = torch_port.graft(variables, ported, ('backbone',))
        elif backbone_cfg['NAME'] in ('ResNet34', 'ContentAware'):
            ported = torch_port.port_torchvision_resnet(
                state, num_input_channels=2, include_fc=False)
            variables = torch_port.graft(variables, ported,
                                         ('backbone', 'resnet34'))
        print(f'Backbone ImageNet weights loaded from {path}')
    aux_path = head_cfg.get('AUXILIARY_RESNET_PATH')
    if aux_path and os.path.exists(aux_path) and aux_path.endswith('.npz'):
        # Native pretext-trained extractor (tools/pretrain_aux.py).
        from bihome_tpu.utils import aux_store
        ported = aux_store.load_aux_npz(aux_path)
        # A --layers 2 npz carries layer2 weights the model does not have
        # at AUXILIARY_RESNET_OUTPUT_LAYER=1 — prune to the model's depth.
        template = {c: variables.get(c, {}).get('auxiliary_resnet', {})
                    for c in ('params', 'batch_stats')}
        ported, dropped = aux_store.prune_to_template(ported, template)
        variables = torch_port.graft(variables, ported,
                                     ('auxiliary_resnet',))
        msg = f'Auxiliary resnet (npz) loaded from {aux_path}'
        if dropped:
            tops = sorted({p.split('/')[1] for p in dropped})
            msg += f' (pruned beyond model depth: {", ".join(tops)})'
        print(msg)
    elif aux_path and os.path.exists(aux_path):
        state = torch_port.load_torch_state_dict(aux_path)
        aux_c = variables['params']['auxiliary_resnet'][
            'conv1']['kernel'].shape[2]
        ported = torch_port.port_torchvision_resnet(
            state, include_fc=False, sum_rgb_stem=(aux_c == 1))
        variables = torch_port.graft(variables, ported,
                                     ('auxiliary_resnet',))
        print(f'Auxiliary resnet weights loaded from {aux_path}')
    # SCORE_CNN_PRETRAINED (ref: src/heads/ransac_utils.py:10-23): the DSAC
    # score CNN's resnet18 loads ImageNet weights except the replaced 2-ch
    # conv1 and 1-unit fc. No-egress analog: SCORE_CNN_PATH names a local
    # torchvision resnet18 .pth (framework extension key).
    score_path = head_cfg.get('SCORE_CNN_PATH')
    if (head_cfg.get('SCORE_CNN_PRETRAINED')
            and 'score_cnn' in variables.get('params', {})
            and score_path and os.path.exists(score_path)):
        state = torch_port.load_torch_state_dict(score_path)
        ported = torch_port.port_torchvision_resnet(
            state, num_input_channels=2, include_fc=False)
        variables = torch_port.graft(variables, ported, ('score_cnn',))
        print(f'Score CNN ImageNet weights loaded from {score_path}')
    return variables


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--config_file', type=str, required=True,
                        help='Config file with learning settings')
    parser.add_argument('--synthetic', action='store_true',
                        help='use the synthetic image pool')
    parser.add_argument('--steps', type=int, default=0,
                        help='cap steps per epoch (smoke runs)')
    parser.add_argument('--epochs', type=int, default=0)
    parser.add_argument('--batch_size', type=int, default=0)
    parser.add_argument('--profile', action='store_true',
                        help='capture a jax.profiler trace of one training '
                             'dispatch into LOGGING.DIR/profile')
    parser.add_argument('--dtype', choices=('float32', 'bfloat16'),
                        default='', help='override MODEL.DTYPE')
    parser.add_argument('--feed', choices=('pool', 'stream'),
                        default='pool',
                        help="input feed: 'pool' keeps a device-resident "
                             "rotating image pool (default; required on "
                             "slow host links), 'stream' uploads each "
                             "batch from the host loader")
    parser.add_argument('--pool_size', type=int, default=1024,
                        help='device image-pool size (feed=pool)')
    parser.add_argument('--pool_refresh_steps', type=int, default=1000,
                        help='refresh the device pool every N steps')
    parser.add_argument('--pool_shard', action='store_true',
                        help='shard the image pool over the mesh data axis; '
                             'each device samples from its own shard')
    parser.add_argument('--steps_per_call', type=int, default=0,
                        help='train steps scanned per dispatch (default: '
                             'auto divisor of LOGGING.STEP)')
    parser.add_argument('--lr', type=float, default=0.0,
                        help='override SOLVER.LR (smoke runs; random init '
                             'often diverges at the reference LR, which '
                             'assumes pretrained ImageNet weights)')
    parser.add_argument('--image_size', type=int, nargs=2,
                        default=(320, 240))
    parser.add_argument('--set', action='append', default=[],
                        metavar='KEY=VALUE',
                        help='dotted config override, e.g. '
                             'MODEL.HEAD.AUXILIARY_RESNET_PATH=aux.npz')
    parser.add_argument('--multihost', action='store_true',
                        help='initialize the JAX distributed runtime '
                             '(multi-host pod execution: one process per '
                             'host, auto-discovered coordinator on TPU; '
                             'the mesh then spans all hosts and gradient '
                             'all-reduce rides ICI/DCN)')
    parser.add_argument('--coordinator', type=str, default='',
                        help='with --multihost: explicit coordinator '
                             'address host:port (needed off-TPU, e.g. the '
                             '2-process CPU exercise in '
                             'tests/test_multiprocess.py); on a TPU pod '
                             'leave unset for auto-discovery')
    parser.add_argument('--num_processes', type=int, default=0,
                        help='with --coordinator: total process count')
    parser.add_argument('--process_id', type=int, default=-1,
                        help='with --coordinator: this process rank')
    _args = parser.parse_args()
    if _args.multihost:
        if _args.coordinator:
            jax.distributed.initialize(
                coordinator_address=_args.coordinator,
                num_processes=_args.num_processes,
                process_id=_args.process_id)
        else:
            jax.distributed.initialize()
    main(_args)
