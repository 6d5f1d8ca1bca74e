"""Numerical parity of core ops against PyTorch (CPU oracle) + shape tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from imagegenerator_tpu.ops import conv2d, conv_transpose2d
from imagegenerator_tpu.ops.grad_utils import clamp_with_grad, replace_grad
from imagegenerator_tpu.ops.quantize import vector_quantize


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


@pytest.mark.parametrize(
    "in_ch,out_ch,k,s,p,hw",
    [(3, 64, 4, 2, 1, 64), (16, 32, 4, 2, 1, 32), (640, 128, 1, 1, 0, 4), (8, 8, 3, 1, 1, 16)],
)
def test_conv2d_matches_torch(in_ch, out_ch, k, s, p, hw):
    x = _rand(2, hw, hw, in_ch, seed=1)
    w = _rand(k, k, in_ch, out_ch, seed=2) * 0.1
    b = _rand(out_ch, seed=3)

    out = conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=s, padding=p)

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    wt = torch.from_numpy(w).permute(3, 2, 0, 1)  # HWIO -> OIHW
    ref = F.conv2d(xt, wt, torch.from_numpy(b), stride=s, padding=p)
    ref = ref.permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "in_ch,out_ch,k,s,p,hw",
    [(228, 192, 4, 1, 0, 1), (192, 96, 4, 2, 1, 4), (24, 3, 4, 2, 1, 32)],
)
def test_conv_transpose2d_matches_torch(in_ch, out_ch, k, s, p, hw):
    x = _rand(2, hw, hw, in_ch, seed=4)
    w = _rand(k, k, out_ch, in_ch, seed=5) * 0.1
    b = _rand(out_ch, seed=6)

    out = conv_transpose2d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=s, padding=p
    )

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    # (kh, kw, out, in) -> torch (in, out, kh, kw)
    wt = torch.from_numpy(w).permute(3, 2, 0, 1)
    ref = F.conv_transpose2d(xt, wt, torch.from_numpy(b), stride=s, padding=p)
    ref = ref.permute(0, 2, 3, 1).numpy()

    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_replace_grad_routes_cotangent():
    xf = jnp.array([1.0, 2.0, 3.0])
    xb = jnp.array([10.0, 20.0, 30.0])

    def f(a, b):
        return jnp.sum(replace_grad(a, b) * jnp.array([1.0, 2.0, 3.0]))

    val, grads = jax.value_and_grad(f, argnums=(0, 1))(xf, xb)
    assert val == pytest.approx(1 + 4 + 9)
    np.testing.assert_allclose(grads[0], np.zeros(3))
    np.testing.assert_allclose(grads[1], np.array([1.0, 2.0, 3.0]))


def test_replace_grad_sums_to_shape():
    # backward arg of smaller (broadcast) shape gets the summed cotangent,
    # mirroring torch's grad_in.sum_to_size (reference utils.py:17).
    xf = jnp.ones((4, 3))
    xb = jnp.ones((1, 3))

    g = jax.grad(lambda a, b: jnp.sum(replace_grad(a, b)), argnums=1)(xf, xb)
    np.testing.assert_allclose(g, np.full((1, 3), 4.0))


def test_clamp_with_grad_matches_torch():
    x = _rand(32, seed=7) * 3
    cotangent = _rand(32, seed=8)

    out, vjp = jax.vjp(lambda v: clamp_with_grad(v, -1.0, 1.0), jnp.asarray(x))
    (gx,) = vjp(jnp.asarray(cotangent))

    xt = torch.from_numpy(x).requires_grad_(True)

    class _Clamp(torch.autograd.Function):
        @staticmethod
        def forward(ctx, input, lo, hi):
            ctx.lo, ctx.hi = lo, hi
            ctx.save_for_backward(input)
            return input.clamp(lo, hi)

        @staticmethod
        def backward(ctx, grad_in):
            (input,) = ctx.saved_tensors
            return (
                grad_in * (grad_in * (input - input.clamp(ctx.lo, ctx.hi)) >= 0),
                None,
                None,
            )

    ref_out = _Clamp.apply(xt, -1.0, 1.0)
    ref_out.backward(torch.from_numpy(cotangent))

    np.testing.assert_allclose(np.asarray(out), ref_out.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx), xt.grad.numpy(), atol=1e-6)


def test_vector_quantize_matches_torch_oracle():
    x = _rand(7, 16, seed=9)
    codebook = _rand(32, 16, seed=10)

    out = vector_quantize(jnp.asarray(x), jnp.asarray(codebook))

    # torch oracle per reference generate.py:42-50
    xt, ct = torch.from_numpy(x), torch.from_numpy(codebook)
    d = xt.pow(2).sum(dim=-1, keepdim=True) + ct.pow(2).sum(dim=1) - 2 * xt @ ct.T
    idx = d.argmin(-1)
    ref = F.one_hot(idx, ct.shape[0]).to(d.dtype) @ ct

    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-4)

    # straight-through gradient: d(sum(q))/dx == ones
    g = jax.grad(lambda v: jnp.sum(vector_quantize(v, jnp.asarray(codebook))))(
        jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(g), np.ones_like(x))


def test_packed_boundary_conv_grads_match_direct():
    """The k4/s2/p1 boundary convs have space-to-depth / depth-to-space
    packed formulations (ops/conv.py, opt-in via IMAGEGEN_PACK_BOUNDARY);
    here we check the packed paths
    (called directly; dispatch is gated on IMAGEGEN_PACK_BOUNDARY)
    and their GRADIENTS against the direct lax lowering — the WGAN-GP double-backward runs through
    these ops twice, so their VJPs must be exact."""
    from jax import lax

    from imagegenerator_tpu.ops.conv import _conv2d_s2d, _conv_transpose2d_d2s

    dimspec = ("NHWC", "HWIO", "NHWC")
    x = jnp.asarray(_rand(2, 16, 16, 3, seed=11))
    w = jnp.asarray(_rand(4, 4, 3, 16, seed=12) * 0.1)

    def packed(x, w):
        return (_conv2d_s2d(x, w, None, None) ** 2).sum()

    def direct(x, w):
        out = lax.conv_general_dilated(
            x, w, (2, 2), ((1, 1), (1, 1)), dimension_numbers=dimspec
        )
        return (out**2).sum()

    for a, b in zip(jax.grad(packed, (0, 1))(x, w), jax.grad(direct, (0, 1))(x, w)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

    # transpose-conv path (RGB output side)
    xt = jnp.asarray(_rand(2, 8, 8, 24, seed=13))
    wt = jnp.asarray(_rand(4, 4, 3, 24, seed=14) * 0.1)

    def packed_t(x, w):
        return (_conv_transpose2d_d2s(x, w, None, None) ** 2).sum()

    def direct_t(x, w):
        w_flip = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
        out = lax.conv_general_dilated(
            x, w_flip, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
            dimension_numbers=dimspec,
        )
        return (out**2).sum()

    for a, b in zip(
        jax.grad(packed_t, (0, 1))(xt, wt), jax.grad(direct_t, (0, 1))(xt, wt)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_packed_conv_odd_size_falls_back():
    """Odd spatial sizes can't space-to-depth; the generic path must run."""
    x = jnp.asarray(_rand(1, 15, 15, 3, seed=15))
    w = jnp.asarray(_rand(4, 4, 3, 8, seed=16))
    out = conv2d(x, w, stride=2, padding=1)
    assert out.shape == (1, 7, 7, 8)
