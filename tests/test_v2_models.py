"""v2 model zoo: VQGAN encode/decode shapes, CLIP towers, converters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagegenerator_tpu.v2.clip import CLIP, CLIPConfig, normalize_image
from imagegenerator_tpu.v2.vqgan import VQGANConfig, VQModel, config_from_yaml_dict


@pytest.fixture(scope="module")
def vq():
    cfg = VQGANConfig.tiny()
    model = VQModel(cfg)
    x = jnp.zeros((2, cfg.resolution, cfg.resolution, 3))
    params = model.init(jax.random.key(0), x)["params"]
    return cfg, model, params


def test_vqgan_encode_decode_shapes(vq):
    cfg, model, params = vq
    x = jax.random.uniform(
        jax.random.key(1), (2, cfg.resolution, cfg.resolution, 3), minval=-1, maxval=1
    )
    z_q, idx = model.apply({"params": params}, x, method=VQModel.encode)
    latent = cfg.resolution // cfg.f
    assert z_q.shape == (2, latent, latent, cfg.embed_dim)
    assert idx.shape == (2, latent, latent) and idx.dtype == jnp.int32

    out = model.apply({"params": params}, z_q, method=VQModel.decode)
    assert out.shape == x.shape


def test_vqgan_quantize_snaps_to_codebook(vq):
    cfg, model, params = vq
    z = jax.random.normal(jax.random.key(2), (1, 4, 4, cfg.embed_dim)) * 0.01
    z_q = model.apply({"params": params}, z, method=VQModel.quantize)
    codebook = np.asarray(params["codebook"])
    flat = np.asarray(z_q).reshape(-1, cfg.embed_dim)
    for row in flat:
        dists = np.linalg.norm(codebook - row, axis=1)
        assert dists.min() < 1e-5  # every output row is a codebook entry


def test_vqgan_f_factor():
    assert VQGANConfig.imagenet_f16_16384().f == 16
    cfg = config_from_yaml_dict(
        {
            "embed_dim": 256,
            "n_embed": 16384,
            "ddconfig": {
                "z_channels": 256,
                "resolution": 256,
                "ch": 128,
                "ch_mult": [1, 1, 2, 2, 4],
                "num_res_blocks": 2,
                "attn_resolutions": [16],
            },
        }
    )
    assert cfg.f == 16 and cfg.num_resolutions == 5


def test_clip_towers():
    cfg = CLIPConfig.tiny()
    model = CLIP(cfg)
    imgs = jax.random.uniform(
        jax.random.key(0), (3, cfg.image_resolution, cfg.image_resolution, 3)
    )
    toks = jnp.zeros((3, cfg.context_length), jnp.int32).at[:, 0].set(5)
    params = model.init(jax.random.key(1), imgs, toks)["params"]
    ie, te = model.apply({"params": params}, normalize_image(imgs), toks)
    assert ie.shape == (3, cfg.embed_dim)
    assert te.shape == (3, cfg.embed_dim)
    assert np.isfinite(np.asarray(ie)).all() and np.isfinite(np.asarray(te)).all()


def test_clip_text_causality():
    """Changing tokens after the EOT position must not change the
    embedding (causal mask + EOT pooling)."""
    cfg = CLIPConfig.tiny()
    model = CLIP(cfg)
    toks = jnp.zeros((1, cfg.context_length), jnp.int32)
    toks = toks.at[0, 0].set(10).at[0, 1].set(20).at[0, 2].set(255)  # EOT=max
    params = model.init(
        jax.random.key(1),
        jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3)),
        toks,
    )["params"]
    e1 = model.apply({"params": params}, toks, method=CLIP.encode_text)
    toks2 = toks.at[0, 5].set(77)  # after EOT
    e2 = model.apply({"params": params}, toks2, method=CLIP.encode_text)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)
