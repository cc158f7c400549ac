"""Multi-PROCESS (process_count > 1) exercise of the distributed helpers.

The 8-device CPU mesh used everywhere else is single-process, so
dist_util's process_allgather/barrier paths were only ever no-ops there.
This test spawns TWO real JAX processes (jax.distributed.initialize over
a localhost coordinator, CPU backend) and runs the eval-side reduction
exactly as eval.py:204-210 does: per-rank per-sample mace arrays ->
dist_util.all_gather -> rank-0 concat + mean (ref analog:
src/utils/dist_util.py:59-96).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow  # heavyweight tier; deselect with -m "not slow"

_WORKER = r'''
import os, sys
os.environ['JAX_PLATFORMS'] = 'cpu'
# The virtual 8-device flag would make each process advertise 8 local
# devices; keep ranks at 1 device each for a clean 2-process topology.
os.environ.pop('XLA_FLAGS', None)
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=2, process_id=int(sys.argv[2]))
from bihome_tpu.parallel import dist_util

assert dist_util.get_world_size() == 2, dist_util.get_world_size()
rank = dist_util.get_rank()

# Per-rank per-sample maces, like eval.py's eval_all output on each host.
maces = (np.arange(4, dtype=np.float32) + 1.0) * (10.0 ** rank)
gathered = dist_util.all_gather(maces)
dist_util.synchronize()
if dist_util.is_main_process():
    allm = np.concatenate([np.asarray(m).reshape(-1) for m in gathered])
    expect = np.concatenate([(np.arange(4) + 1.0),
                             (np.arange(4) + 1.0) * 10.0]).astype(np.float32)
    assert sorted(allm.tolist()) == sorted(expect.tolist()), allm
    print('MULTIPROC_OK mean_mace=%.4f' % float(np.mean(allm)))
else:
    # Non-main ranks print nothing (eval.py gates output the same way).
    assert not dist_util.is_main_process()
'''


_TRAIN_WORKER = r'''
import os, sys, hashlib
os.environ['JAX_PLATFORMS'] = 'cpu'
# 4 virtual CPU devices PER PROCESS -> an 8-device mesh spanning 2 processes.
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_platforms', 'cpu')
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=2, process_id=int(sys.argv[2]))
from jax.sharding import NamedSharding, PartitionSpec as P
from bihome_tpu import config as config_lib
from bihome_tpu.data import pipeline, synthetic
from bihome_tpu.heads import AssembledModel, HeadConfig
from bihome_tpu.models import backbones
from bihome_tpu.parallel import dist_util
from bihome_tpu.parallel import mesh as mesh_lib
from bihome_tpu.training import trainer as trainer_lib
from bihome_tpu.training import train_state as ts_lib

assert jax.process_count() == 2
assert jax.local_device_count() == 4
assert jax.device_count() == 8
rank = dist_util.get_rank()

PS = 16
BATCH = 8
# Tiny supervised model (HomographyNet regressor + NoOp head + MSE): real
# trainer code path, small enough that two processes can compile it
# concurrently on this 1-core host.
backbone = backbones.HomographyNetBackbone(image_size=128)
head = HeadConfig(name='NoOpHead', target_gen='4_points',
                  learning_keys=('delta', 'delta_hat_12', 'delta',
                                 'delta_hat_12'), patch_size=PS)
spec = pipeline.PairSpec(rho=4, patch_size=PS, photometric_keys=(),
                         max_delta=0.0)
built = config_lib.BuiltModel(model=AssembledModel(backbone=backbone,
                                                   head=head),
                              head_cfg=head, pair_spec=spec,
                              test_pair_spec=spec, loss_name='MSELoss',
                              config={})

# Identical deterministic init on both ranks (same seed, same math).
pool_np = synthetic.make_image_pool(16, 40, 48, seed=0)
variables = trainer_lib.init_model(built, pool_np[:BATCH])
tx, schedule = ts_lib.make_optimizer(lr=1e-3, milestones=[1000], decay=0.1)
state = ts_lib.create_train_state(variables, tx)

mesh = mesh_lib.make_mesh(jax.devices())          # spans BOTH processes
rep = mesh_lib.replicated_sharding(mesh)
shd = mesh_lib.batch_sharding(mesh)


def to_global(tree, sharding):
    # Host numpy (same value on every process) -> global jax.Array.
    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])
    return jax.tree_util.tree_map(put, tree)


state = to_global(state, rep)
pool = to_global(pool_np, shd)                    # pool SHARDED over 'data'
rng = to_global(jax.random.PRNGKey(0), rep)

# The real train path: sharded-pool feed (shard_map gather) + fused train
# step, jitted over the 2-process mesh; XLA's gradient all-reduce rides the
# cross-process collective.
pool_step = jax.jit(trainer_lib.make_pool_train_step(
    built, tx, schedule, num_steps=2, batch_size=BATCH, mesh=mesh))
state, metrics = pool_step(state, pool, rng)
jax.block_until_ready(state.params)

loss = float(np.asarray(metrics['loss/train'].addressable_data(0)))
assert np.isfinite(loss), loss
assert int(np.asarray(state.step.addressable_data(0))) == 2

# Post-step params must be IDENTICAL on both ranks (replicated state, one
# global gradient) -- hash the concatenated bytes and cross-check.
leaves = jax.tree_util.tree_leaves(state.params)
h = hashlib.md5()
for leaf in leaves:
    h.update(np.ascontiguousarray(
        np.asarray(leaf.addressable_data(0))).tobytes())
digest = np.frombuffer(h.digest(), dtype=np.uint8).copy()
hashes = dist_util.all_gather(digest)
dist_util.synchronize()
assert all(np.array_equal(np.asarray(d), digest) for d in hashes), hashes
if dist_util.is_main_process():
    print('MULTIPROC_TRAIN_OK loss=%.6f' % loss)
'''


def _free_port() -> int:
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_all_gather_eval_reduction(tmp_path):
    coord = f'127.0.0.1:{_free_port()}'
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('XLA_FLAGS', None)
    env.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
    procs = [subprocess.Popen(
        [sys.executable, '-c', _WORKER, coord, str(rank)],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for rank in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f'rank failed:\n{out[-2000:]}\n{err[-2000:]}'
    assert 'MULTIPROC_OK mean_mace=13.7500' in outs[0][1], outs[0][1]
    assert 'MULTIPROC_OK' not in outs[1][1]


def test_two_process_train_step():
    """The multi-host train leg (VERDICT r3 item 3): a jax.distributed mesh
    spanning 2 real processes x 4 virtual devices runs one fused
    make_pool_train_step (sharded-pool feed) — finite loss, identical
    post-step param hashes on both ranks (ref analog: the never-constructed
    DDP path, src/utils/dist_util.py:7-96, train.py:513-518)."""
    coord = f'127.0.0.1:{_free_port()}'
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('XLA_FLAGS', None)
    env.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
    procs = [subprocess.Popen(
        [sys.executable, '-c', _TRAIN_WORKER, coord, str(rank)],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for rank in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f'rank failed:\n{out[-2000:]}\n{err[-3000:]}'
    assert 'MULTIPROC_TRAIN_OK' in outs[0][1], outs[0][1]
    assert 'MULTIPROC_TRAIN_OK' not in outs[1][1]
