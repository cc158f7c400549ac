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
