"""imagegenerator_tpu — a TPU-native (JAX/XLA/Pallas/pjit) text-to-image framework.

A ground-up rebuild of the capabilities of anishbasnet969/ImageGenerator:

* **v1** — a StackGAN-style two-stage conditional WGAN-GP (64px Stage-I,
  256px Stage-II) trained data-parallel over a ``jax.sharding.Mesh``
  (reference: ``train.py``, ``stage_{1,2}_train_fn.py``).
* **v2** — a VQGAN+CLIP latent-optimization image generator where the whole
  iteration (VQGAN decode → cutouts → CLIP scoring → Adam update on the
  latent) compiles to one XLA graph (reference: ``v2_implementation/``).

Design stance (TPU-first, not a port):

* NHWC layouts, bfloat16 compute / float32 params by default.
* Pure-function models (flax.linen), explicit PRNG-key threading.
* SPMD via ``shard_map`` over a named mesh; gradients ``pmean``-reduced
  over the ``data`` axis; per-replica BatchNorm semantics (matching the
  reference's torch_xla per-core BN).
* Orbax checkpointing, host-side prefetch data pipeline, Pallas kernels
  for the fused hot blocks.
"""

__version__ = "0.2.0"  # keep in sync with pyproject.toml

from imagegenerator_tpu import ops, models  # noqa: F401
