"""Serving export round-trip: jax.export artifact == live model.

The exported StableHLO artifact must embed the weights (callable with
ONLY patches as inputs), survive serialize/deserialize, and reproduce the
live predict_homography chain exactly (ref: eval.py:21-28).
"""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from bihome_tpu import config as config_lib
from bihome_tpu import serving
from bihome_tpu.data import datasets
from bihome_tpu.training import trainer as trainer_lib
from bihome_tpu.training import train_state as ts_lib

pytestmark = pytest.mark.slow  # heavyweight tier; deselect with -m "not slow"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = os.path.join(REPO, 'config/s-coco/detone-orig-lr-5e-3.yaml')


@pytest.fixture(scope='module')
def built_state():
    config = config_lib.load_config(CONFIG)
    built = config_lib.build_model(config)
    tx, _ = ts_lib.make_optimizer(**config_lib.solver_kwargs(config))
    ds = datasets.SyntheticDataset(image_size=(320, 240), seed=7)
    sample = np.stack([ds.load_image(0)])
    variables = trainer_lib.init_model(built, sample)
    state = ts_lib.create_train_state(variables, tx)
    return built, state


class TestServingExport:

    def test_round_trip_matches_live_model(self, built_state, tmp_path):
        built, state = built_state
        exp = serving.export_predict(built, state, batch_size=1,
                                     platforms=['cpu'])
        path = str(tmp_path / 'model.shlo')
        serving.save_exported(exp, path)

        predict = serving.load_exported(path)
        serve, specs = serving.make_serving_fn(built, state, batch_size=1)
        rng = np.random.RandomState(0)
        p1, p2 = (rng.randn(*s.shape).astype(np.float32) for s in specs)

        got = np.asarray(predict(p1, p2))
        want = np.asarray(jax.jit(serve)(p1, p2))
        assert got.shape == (1, 4, 2)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_input_signature_peek(self, built_state, tmp_path):
        built, state = built_state
        exp = serving.export_predict(built, state, batch_size=2,
                                     platforms=['cpu'])
        path = str(tmp_path / 'model_b2.shlo')
        serving.save_exported(exp, path)
        ps = built.test_pair_spec.patch_size
        assert serving.exported_input_shapes(path) == (
            (2, ps, ps, 1), (2, ps, ps, 1))

    def test_symbolic_batch_polymorphic_artifact(self, built_state,
                                                 tmp_path):
        """batch_size='b' exports ONE artifact serving any batch size,
        matching the live model at each concrete size."""
        built, state = built_state
        exp = serving.export_predict(built, state, batch_size='b',
                                     platforms=['cpu'])
        path = str(tmp_path / 'poly.shlo')
        serving.save_exported(exp, path)
        predict = serving.load_exported(path)
        serve, _ = serving.make_serving_fn(built, state, batch_size=1)
        ps = built.test_pair_spec.patch_size
        rng = np.random.RandomState(2)
        for b in (1, 3):
            p1 = rng.randn(b, ps, ps, 1).astype(np.float32)
            p2 = rng.randn(b, ps, ps, 1).astype(np.float32)
            got = np.asarray(predict(p1, p2))
            want = np.asarray(jax.jit(serve)(p1, p2))
            assert got.shape == (b, 4, 2)
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_export_cli(self, tmp_path):
        """tools/export_model.py end-to-end on CPU (random init — no
        checkpoint in the test env): exports, self-checks, writes the
        artifact."""
        out = str(tmp_path / 'cli.shlo')
        env = dict(os.environ)
        env['JAX_PLATFORMS'] = 'cpu'
        env.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
        env.pop('XLA_FLAGS', None)
        proc = subprocess.run(
            [sys.executable, 'tools/export_model.py',
             '--config_file', CONFIG, '--out', out, '--batch_size', '2',
             '--platforms', 'cpu', '--check',
             '--set', f'LOGGING.DIR={tmp_path / "nolog"}'],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=540)
        assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
        assert 'check: max |exported - live|' in proc.stdout
        assert serving.exported_input_shapes(out) == (
            (2, 128, 128, 1), (2, 128, 128, 1))

    def test_bench_serving_cli(self, built_state, tmp_path):
        """tools/bench_serving.py reports latency for a saved artifact
        (fixed and polymorphic batch) and emits the JSON line."""
        import json
        built, state = built_state
        path = str(tmp_path / 'bench.shlo')
        serving.save_exported(
            serving.export_predict(built, state, batch_size='b',
                                   platforms=['cpu']), path)
        env = dict(os.environ)
        env['JAX_PLATFORMS'] = 'cpu'
        env.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
        env.pop('XLA_FLAGS', None)
        proc = subprocess.run(
            [sys.executable, 'tools/bench_serving.py', '--artifact', path,
             '--batch', '2', '--iters', '3', '--warmup', '1', '--json'],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=540)
        assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
        line = json.loads(proc.stdout.strip().splitlines()[-1])
        assert line['metric'] == 'serving_latency_ms'
        assert line['value'] > 0 and line['batch'] == 2

    def test_weights_are_embedded(self, built_state, tmp_path):
        """Artifact output must change when weights change (no silent
        re-init at load time) — i.e. params are constants in the module."""
        built, state = built_state
        path_a = str(tmp_path / 'a.shlo')
        serving.save_exported(
            serving.export_predict(built, state, 1, platforms=['cpu']),
            path_a)
        bumped = state.replace(
            params=jax.tree.map(lambda x: x + 0.05, state.params))
        path_b = str(tmp_path / 'b.shlo')
        serving.save_exported(
            serving.export_predict(built, bumped, 1, platforms=['cpu']),
            path_b)
        rng = np.random.RandomState(1)
        _, specs = serving.make_serving_fn(built, state, batch_size=1)
        p1, p2 = (rng.randn(*s.shape).astype(np.float32) for s in specs)
        out_a = np.asarray(serving.load_exported(path_a)(p1, p2))
        out_b = np.asarray(serving.load_exported(path_b)(p1, p2))
        assert not np.allclose(out_a, out_b)
