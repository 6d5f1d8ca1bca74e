"""v2: VQGAN+CLIP latent-optimization image generation, fully jitted.

JAX reimplementation of the reference's ``v2_implementation/`` — the
VQGAN and CLIP models themselves (which the reference vendors from
taming-transformers and OpenAI CLIP), the cutout/augmentation sampler,
the prompt loss, and a generation engine where one optimization
iteration (VQGAN decode -> cutouts -> CLIP -> losses -> Adam update on
the latent) is a single XLA graph.
"""
