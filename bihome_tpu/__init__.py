"""bihome_tpu — a TPU-native (JAX/XLA/Pallas) homography-estimation framework.

A from-scratch rebuild of the capabilities of NeurAI-Lab/biHomE ("Perceptual
Loss for Robust Unsupervised Homography Estimation", CVPR'21 IMW) designed for
TPU hardware: batched/jit-compiled geometry, on-device synthetic-pair
generation, flax models, pure-function losses, and pjit data parallelism over
a `jax.sharding.Mesh`.

Reference repo layout is documented in SURVEY.md; reference citations in
docstrings use ``ref:`` prefixes pointing at file:line in /root/reference.
"""

__version__ = "0.1.0"

from bihome_tpu import geometry  # noqa: F401
