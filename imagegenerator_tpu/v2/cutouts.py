"""Vectorized random-cutout sampler.

Capability match for ``MakeCutouts``
(``/root/reference/v2_implementation/vision_utils.py:93-125``), which
takes 32 random square crops per step (size ``rand()**cut_pow *
(max-min) + min``, random offset), Lanczos-filters + bicubic-resizes
each to the CLIP resolution in a *Python loop*, then augments and adds
scaled uniform noise.

TPU-first redesign (SURVEY.md §3.3 'the dominant fusion opportunity'):
all ``cutn`` crop geometries are sampled with one key and applied as a
single vmapped ``jax.image.scale_and_translate`` with a ``lanczos3``
kernel — dynamic *values* (scale/translation arrays), static *shapes*,
so the whole sampler compiles into the one-iteration XLA graph. The
continuous crop geometry subsumes the reference's separate
lanczos-downfilter + bicubic-resize pair (lanczos3 is itself the
antialiasing resampler).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from imagegenerator_tpu.v2.augment import (
    random_augment,
    random_color_augment,
    random_geometry,
)
from imagegenerator_tpu.v2.warp2pass import (
    resize_axis_aligned,
    warp_homography_2pass,
)


@dataclasses.dataclass(frozen=True)
class MakeCutouts:
    cut_size: int
    cutn: int = 32
    cut_pow: float = 1.0
    noise_fac: float = 0.1
    augment: bool = True
    # Force the lanczos3 scale_and_translate path even when the composed
    # single-warp fast path applies (reference-faithful antialiasing for
    # A/B comparisons; ADVICE.md round-2).
    force_lanczos: bool = False
    # Split the fast-path warp into (aug warp at source res) + (axis-
    # aligned MXU resize) instead of one composed homography warp. None
    # = env IMAGEGEN_WARP_SPLIT (default on). False = the composed
    # single-lerp warp (tightest interpolation; 14% slower whole-step).
    warp_split: bool | None = None

    def _use_split(self) -> bool:
        import os

        if self.warp_split is not None:
            return self.warp_split
        return os.environ.get("IMAGEGEN_WARP_SPLIT", "1") == "1"

    def __call__(self, key: jax.Array, images: jax.Array) -> jax.Array:
        """images: (B, H, W, C) in [0, 1] -> (B * cutn, cut_size,
        cut_size, C). Cutout i of every batch image shares geometry,
        matching the reference (its loop crops the whole batch)."""
        B, H, W, C = images.shape
        max_size = float(min(W, H))
        min_size = float(min(W, H, self.cut_size))

        k_size, k_off, k_aug, k_noise, k_nfac = jax.random.split(key, 5)
        u = jax.random.uniform(k_size, (self.cutn,))
        sizes = u ** self.cut_pow * (max_size - min_size) + min_size
        offs = jax.random.uniform(k_off, (self.cutn, 2))
        off_y = offs[:, 0] * (H - sizes)
        off_x = offs[:, 1] * (W - sizes)

        # Composed fast path: when every crop is a pure MAGNIFICATION
        # (source no bigger than cut_size — always true at the reference
        # default 128px image / 224px CLIP), antialiasing is a no-op, so
        # crop+rescale+flip+affine+perspective collapse into ONE
        # rectangular two-pass warp per cutout. Color augs then run on
        # source-resolution copies (fewer pixels, same order vs the
        # geometric augs as the reference: jitter/sharp before warp).
        # The VPU-bound warp weight generation — the v2 step's largest
        # single cost, see benchmarks/PROFILE_v2_r02.md — shrinks with
        # the source width, and the separate lanczos resample vanishes.
        if self.augment and not self.force_lanczos and min(H, W) <= self.cut_size:
            N = B * self.cutn
            copies = jnp.broadcast_to(images[None], (self.cutn, B, H, W, C))
            copies = copies.transpose(1, 0, 2, 3, 4).reshape(N, H, W, C)
            colored = random_color_augment(k_aug, jnp.clip(copies, 0.0, 1.0))
            Ms_aug = random_geometry(
                jax.random.fold_in(k_aug, 1), N, self.cut_size, self.cut_size
            )
            # crop map: out(cut_size) -> source window [o, o+size), with
            # pixel-CENTER alignment: src = (out + 0.5)*s - 0.5 + o
            #                             = s*out + o + (s-1)/2,
            # matching scale_and_translate's half-pixel convention on the
            # slow path (round 2 omitted the (s-1)/2 term, shifting each
            # crop by up to half a source pixel — ADVICE.md round-2).
            s = sizes / self.cut_size  # (cutn,)
            half = (s - 1.0) / 2.0
            zeros = jnp.zeros_like(s)
            ones = jnp.ones_like(s)
            M_crop = jnp.stack(
                [
                    jnp.stack([s, zeros, off_y + half], -1),
                    jnp.stack([zeros, s, off_x + half], -1),
                    jnp.stack([zeros, zeros, ones], -1),
                ],
                axis=-2,
            )  # (cutn, 3, 3)
            # sample n = b * cutn + ci: cutout index varies fastest
            M_crop_n = jnp.tile(M_crop, (B, 1, 1))
            if self._use_split():
                # SPLIT factorization (round-4 default): G = M_crop @
                # M_aug = M_aug_src @ M_crop with M_aug_src = M_crop
                # M_aug M_crop^-1 — the aug homography conjugated into
                # SOURCE coordinates. The aug warp then runs at source
                # resolution (HxW dense weight grids instead of
                # cut_size^2) and the crop+rescale becomes an
                # axis-aligned resize whose (O, K) weights are shared
                # across scanlines — a real MXU matmul. Why: the
                # composed warp's per-scanline tent-weight grids are
                # ~646 MB/iter of pure HBM traffic at the 32x(128->224)
                # default and profile as HBM-BOUND (the whole v2 step's
                # largest cost, benchmarks/PROFILE_v2_r04.md); the
                # split cuts the grid elements 10.1M -> 4.2M per image
                # and measured +14% whole-step. Cost: one extra lerp
                # stage when affine/perspective fire (flip-only and
                # no-aug cutouts stay exact — integer maps make the
                # tent one-hot); the reference's own chain resamples
                # MORE (lanczos resize, then per-aug kornia bilinear
                # warps: vision_utils.py:71-125).
                s_n = jnp.tile(s, (B,))
                t_y = jnp.tile(off_y + half, (B,))
                t_x = jnp.tile(off_x + half, (B,))
                zeros_n = jnp.zeros_like(s_n)
                ones_n = jnp.ones_like(s_n)
                inv_crop = jnp.stack(
                    [
                        jnp.stack([1.0 / s_n, zeros_n, -t_y / s_n], -1),
                        jnp.stack([zeros_n, 1.0 / s_n, -t_x / s_n], -1),
                        jnp.stack([zeros_n, zeros_n, ones_n], -1),
                    ],
                    axis=-2,
                )  # (N, 3, 3)
                M_aug_src = jnp.einsum(
                    "nij,njk,nkl->nil", M_crop_n, Ms_aug, inv_crop
                )
                auged = warp_homography_2pass(
                    colored, M_aug_src, out_shape=(H, W)
                )
                cuts = resize_axis_aligned(
                    auged,
                    scale=jnp.stack([s_n, s_n], -1),
                    offset=jnp.stack([t_y, t_x], -1),
                    out_shape=(self.cut_size, self.cut_size),
                )
            else:
                Ms = jnp.einsum("nij,njk->nik", M_crop_n, Ms_aug)
                cuts = warp_homography_2pass(
                    colored, Ms, out_shape=(self.cut_size, self.cut_size)
                )
            cuts = jnp.clip(cuts, 0.0, 1.0)
        else:
            out_shape = (B, self.cut_size, self.cut_size, C)

            def one_cutout(size, oy, ox):
                # map input window [o, o+size) onto [0, cut_size)
                scale = jnp.full((2,), self.cut_size) / size
                translation = -jnp.stack([oy, ox]) * (self.cut_size / size)
                return jax.image.scale_and_translate(
                    images, out_shape, (1, 2), scale, translation,
                    method="lanczos3",
                )

            cuts = jax.vmap(one_cutout)(sizes, off_y, off_x)  # (cutn, B, ...)
            cuts = cuts.transpose(1, 0, 2, 3, 4).reshape(
                B * self.cutn, self.cut_size, self.cut_size, C
            )
            cuts = jnp.clip(cuts, 0.0, 1.0)

            if self.augment:
                cuts = random_augment(k_aug, cuts)

        if self.noise_fac:
            facs = jax.random.uniform(
                k_nfac, (B * self.cutn, 1, 1, 1), maxval=self.noise_fac
            )
            cuts = cuts + facs * jax.random.normal(k_noise, cuts.shape)
        return cuts
