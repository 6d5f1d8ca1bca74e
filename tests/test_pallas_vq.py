"""Pallas fused VQ argmin kernel vs the XLA reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagegenerator_tpu.ops.pallas.vq_kernel import (
    nearest_codebook_indices_pallas,
    supported,
)
from imagegenerator_tpu.ops.quantize import nearest_codebook_indices


@pytest.mark.parametrize("n,k,d", [(64, 512, 128), (300, 2048, 128), (17, 3000, 256)])
def test_pallas_vq_matches_xla(n, k, d):
    kx, kc = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (n, d), jnp.float32)
    cb = jax.random.normal(kc, (k, d), jnp.float32)

    want = nearest_codebook_indices(x, cb, use_pallas=False)
    got = nearest_codebook_indices_pallas(x, cb, interpret=True)

    # ties can legitimately differ; require the chosen entries to be
    # exactly as close as the reference choice
    want_n = np.asarray(want)
    got_n = np.asarray(got)
    if not np.array_equal(want_n, got_n):
        xd = np.asarray(x)
        cbd = np.asarray(cb)
        d_want = np.sum((xd - cbd[want_n]) ** 2, axis=1)
        d_got = np.sum((xd - cbd[got_n]) ** 2, axis=1)
        np.testing.assert_allclose(d_got, d_want, rtol=1e-5, atol=1e-5)


def test_supported_gate():
    assert supported(256) and supported(128)
    assert not supported(8)
