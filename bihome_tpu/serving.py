"""Production-serving export: package a trained model as a self-contained
StableHLO artifact via ``jax.export``.

The reference's only inference surface is eval.py's ModelWrapper
(ref: eval.py:21-28), which needs the whole framework + a torch checkpoint
at serve time. The TPU-native production unit is different: an AOT-exported
``predict`` function with the trained weights embedded as constants, usable
from ANY JAX process (CPU or TPU serving fleet) with zero framework code —

    exp = bihome_tpu.serving.load_exported('model.shlo')
    delta_hat = exp(patch_1, patch_2)       # [B, 4, 2] corner deltas

Artifacts are multi-platform (lowered for both 'cpu' and 'tpu' by default)
and carry the input signature; the serialized form is the versioned
StableHLO bytecode produced by ``jax.export.Exported.serialize``.
"""

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import export as jax_export

from bihome_tpu import geometry


def make_serving_fn(built, state, batch_size: Union[int, str],
                    rng_seed: int = 0):
    """A pure ``(patch_1, patch_2) -> delta_hat`` closure over trained
    weights, following the predict_homography chain (ref: eval.py:21-28).

    Corners are fixed to the patch-local frame: delta_hat does not depend
    on where the patch sat in its source image, only the (unreturned)
    homography's translation does. Stochastic predict paths (DSAC sampling,
    RANSAC postprocess) run under a fixed PRNG key so serving is
    deterministic; also returns the input ShapeDtypeStructs for export.

    ``batch_size`` may be a symbolic-dimension NAME (e.g. ``'b'``): the
    exported artifact then accepts any leading batch dimension (shape
    polymorphism, jax.export.symbolic_shape) instead of one fixed size.
    """
    from bihome_tpu.training import trainer as trainer_lib

    predict_fn = trainer_lib.make_predict_step(built)
    ps = built.test_pair_spec.patch_size
    rng = jax.random.PRNGKey(rng_seed)

    def serve(patch_1, patch_2):
        # Corners derive from the runtime batch dim so the same trace
        # serves fixed and symbolic batch sizes.
        corners = geometry.image_corners(ps, ps,
                                         batch_size=patch_1.shape[0])
        batch = {'patch_1': patch_1, 'patch_2': patch_2, 'corners': corners}
        delta_hat, _ = predict_fn(state, batch, rng)
        return delta_hat.reshape(patch_1.shape[0], 4, 2)

    n_ch = 1 if built.test_pair_spec.grayscale_keys else 3
    if isinstance(batch_size, str):
        batch_dim, = jax_export.symbolic_shape(batch_size)
    else:
        batch_dim = batch_size
    spec = jax.ShapeDtypeStruct((batch_dim, ps, ps, n_ch), jnp.float32)
    return serve, (spec, spec)


def export_predict(built, state, batch_size: Union[int, str] = 1,
                   platforms: Sequence[str] = ('cpu', 'tpu'),
                   rng_seed: int = 0) -> jax_export.Exported:
    """AOT-export the predict function with weights baked in.

    Cross-platform lowering: the artifact can be produced on a CPU host and
    served on TPU (and vice versa). Multi-platform artifacts that include
    'cpu' are traced with the portable PF-head composition
    (BIHOME_PF_HEAD=ref — same parameters and math as the fused Pallas
    kernel, which only lowers for TPU; see models/backbones.PFHead). A
    TPU-only export keeps the fused kernel.

    ``batch_size='b'`` exports a batch-polymorphic artifact (one trace,
    any batch size at call time).
    """
    import os
    force_ref = 'cpu' in platforms
    prev = os.environ.get('BIHOME_PF_HEAD')
    if force_ref:
        os.environ['BIHOME_PF_HEAD'] = 'ref'
    try:
        serve, specs = make_serving_fn(built, state, batch_size,
                                       rng_seed=rng_seed)
        return jax_export.export(jax.jit(serve),
                                 platforms=list(platforms))(*specs)
    finally:
        if force_ref:
            if prev is None:
                os.environ.pop('BIHOME_PF_HEAD', None)
            else:
                os.environ['BIHOME_PF_HEAD'] = prev


def save_exported(exp: jax_export.Exported, path: str) -> None:
    with open(path, 'wb') as f:
        f.write(exp.serialize())


def load_exported(path: str):
    """Deserialize a saved artifact; returns a callable
    ``(patch_1, patch_2) -> delta_hat`` (jit-compiled on first call for
    whatever platform the hosting process runs on)."""
    with open(path, 'rb') as f:
        exp = jax_export.deserialize(f.read())
    return jax.jit(exp.call)


def exported_input_shapes(path: str) -> Tuple[Tuple[int, ...], ...]:
    """Peek at an artifact's input signature without running it."""
    with open(path, 'rb') as f:
        exp = jax_export.deserialize(f.read())
    return tuple(tuple(a.shape) for a in exp.in_avals)
