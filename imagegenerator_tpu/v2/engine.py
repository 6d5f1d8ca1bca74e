"""VQGAN+CLIP latent-optimization engine.

The reference's per-iteration work (``/root/reference/v2_implementation/
generate.py:137-180``): synth (vector_quantize -> VQGAN decode -> clamped
[0,1]) -> 32 cutouts -> CLIP image embeds -> per-prompt spherical losses
-> backward -> Adam step on the latent -> clamp z to the codebook range.

Here that whole iteration — decode, cutouts, CLIP forward AND backward,
Adam update, z clamp — is ONE jitted XLA graph (`GenerateEngine.step`),
with an explicit PRNG key per iteration. Generation is batched: ``z`` is
(B, h, w, e_dim) and each batch element optimizes against its own prompt
set (padded to a fixed P with zero weights), so multi-prompt generation
shards data-parallel over a device mesh with zero collectives
(BASELINE.json config 5).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from imagegenerator_tpu.ops.grad_utils import clamp_with_grad, replace_grad
from imagegenerator_tpu.ops.quantize import vector_quantize
from imagegenerator_tpu.v2.clip import CLIP, CLIPConfig, normalize_image
from imagegenerator_tpu.v2.cutouts import MakeCutouts
from imagegenerator_tpu.v2.prompts import spherical_dist
from imagegenerator_tpu.v2.vqgan import VQGANConfig, VQModel


class LatentState(struct.PyTreeNode):
    z: jax.Array  # (B, h, w, e_dim)
    opt_state: Any
    step: jax.Array


@dataclasses.dataclass(eq=False)  # identity hash: jit static_argnums=0
class GenerateEngine:
    vqgan_config: VQGANConfig
    clip_config: CLIPConfig
    vqgan_params: dict
    clip_params: dict
    cutn: int = 32
    cut_pow: float = 1.0
    step_size: float = 0.1
    augment: bool = True
    compute_dtype: Any = None

    def __post_init__(self):
        self.vqmodel = VQModel(self.vqgan_config, dtype=self.compute_dtype)
        self.clip = CLIP(self.clip_config, dtype=self.compute_dtype)
        self.make_cutouts = MakeCutouts(
            cut_size=self.clip_config.image_resolution,
            cutn=self.cutn,
            cut_pow=self.cut_pow,
            augment=self.augment,
        )
        self.tx = optax.adam(self.step_size, b1=0.9, b2=0.999, eps=1e-8)
        # commit params to device arrays once (they are jit arguments of
        # every step; numpy leaves would re-upload per call)
        self.vqgan_params = jax.tree.map(jnp.asarray, self.vqgan_params)
        self.clip_params = jax.tree.map(jnp.asarray, self.clip_params)
        codebook = np.asarray(self.vqgan_params["codebook"])
        # per-channel codebook bounds (reference generate.py:91-92)
        self.z_min = jnp.asarray(codebook.min(axis=0))[None, None, None, :]
        self.z_max = jnp.asarray(codebook.max(axis=0))[None, None, None, :]

    # ---------------------------------------------------------------- init
    def encode_text(self, tokens: np.ndarray) -> jax.Array:
        """tokens (N, context) -> (N, embed_dim) float32."""
        return self.clip.apply(
            {"params": self.clip_params},
            jnp.asarray(tokens),
            method=CLIP.encode_text,
        ).astype(jnp.float32)

    def encode_image_to_latent(self, images: jax.Array) -> jax.Array:
        """[-1,1] NHWC images -> quantized latents (the reference's
        ``model.encode`` init path, generate.py:94-105)."""
        z_q, _ = self.vqmodel.apply(
            {"params": self.vqgan_params}, images, method=VQModel.encode
        )
        return z_q.astype(jnp.float32)

    def random_token_latent(self, key: jax.Array, batch: int, h: int, w: int):
        """One-hot random codebook tokens (generate.py:107-111)."""
        c = self.vqgan_config
        idx = jax.random.randint(key, (batch, h, w), 0, c.n_embed)
        return jnp.take(
            jnp.asarray(self.vqgan_params["codebook"]), idx, axis=0
        ).astype(jnp.float32)

    def init_state(self, z: jax.Array) -> LatentState:
        return LatentState(
            z=z, opt_state=self.tx.init(z), step=jnp.zeros((), jnp.int32)
        )

    # ---------------------------------------------------------------- synth
    @partial(jax.jit, static_argnums=0)
    def _synth_impl(self, vq_params, z):
        z_q = vector_quantize(z, vq_params["codebook"])
        dec = self.vqmodel.apply({"params": vq_params}, z_q, method=VQModel.decode)
        return clamp_with_grad((dec.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0)

    def synth(self, z: jax.Array) -> jax.Array:
        """latent -> [0,1] image with straight-through quantize + clamped
        gradient (reference generate.py:137-141)."""
        return self._synth_impl(self.vqgan_params, z)

    @partial(jax.jit, static_argnums=0)
    def _losses_impl(self, vq_params, clip_params, z, key, embeds, weights, stops):
        return self._losses(z, key, embeds, weights, stops, vq_params, clip_params)

    # ---------------------------------------------------------------- loss
    def _losses(self, z, key, embeds, weights, stops, vq_params=None, clip_params=None):
        """Per-(batch, prompt) loss matrix (B, P). Params default to the
        engine's own trees; the jitted step passes them explicitly so the
        multi-hundred-MB weights travel as jit ARGUMENTS rather than being
        baked into the HLO as constants (which overflows compile-payload
        limits and bloats every recompile)."""
        vq_params = self.vqgan_params if vq_params is None else vq_params
        clip_params = self.clip_params if clip_params is None else clip_params
        B = z.shape[0]
        z_q = vector_quantize(z, vq_params["codebook"])
        dec = self.vqmodel.apply({"params": vq_params}, z_q, method=VQModel.decode)
        out = clamp_with_grad((dec.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0)
        cuts = self.make_cutouts(key, out)  # (B*cutn, s, s, C)
        img_embeds = self.clip.apply(
            {"params": clip_params},
            normalize_image(cuts),
            method=CLIP.encode_image,
        ).astype(jnp.float32)
        img_embeds = img_embeds.reshape(B, self.cutn, -1)

        def per_batch(ie, emb, w, s):
            d = spherical_dist(ie, emb)  # (cutn, P)
            d = d * jnp.sign(w)[None, :]
            floored = replace_grad(d, jnp.maximum(d, s[None, :]))
            return jnp.abs(w) * floored.mean(axis=0)  # (P,)

        return jax.vmap(per_batch)(img_embeds, embeds, weights, stops)

    # ---------------------------------------------------------------- step
    def _step_body(
        self, vq_params, clip_params, state: LatentState, key, embeds, weights, stops
    ):
        """One optimization iteration (pure function of its args); shared
        by the single-step jit and the scan-chained jit."""

        def total_loss(z):
            losses = self._losses(
                z, key, embeds, weights, stops, vq_params, clip_params
            )
            return jnp.sum(losses), losses

        (_, losses), grads = jax.value_and_grad(total_loss, has_aux=True)(state.z)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.z)
        z = optax.apply_updates(state.z, updates)
        z = jnp.clip(z, self.z_min, self.z_max)  # generate.py:178-179
        return LatentState(z=z, opt_state=opt_state, step=state.step + 1), losses

    @partial(jax.jit, static_argnums=0, donate_argnums=3)
    def _step_impl(
        self, vq_params, clip_params, state: LatentState, key, embeds, weights, stops
    ):
        return self._step_body(
            vq_params, clip_params, state, key, embeds, weights, stops
        )

    def step(self, state: LatentState, key: jax.Array, embeds, weights, stops):
        """One fused optimization iteration. embeds: (B, P, D); weights,
        stops: (B, P). Returns (new_state, per-prompt losses (B, P))."""
        return self._step_impl(
            self.vqgan_params, self.clip_params, state, key, embeds, weights, stops
        )

    # ---------------------------------------------------------------- chain
    @partial(jax.jit, static_argnums=(0, 4), donate_argnums=3)
    def _chain_impl(
        self, vq_params, clip_params, state: LatentState, n: int, key,
        embeds, weights, stops,
    ):
        """``n`` iterations as ONE device dispatch (lax.scan over the step
        body). The reference's hot loop (generate.py:167-180) is a Python
        loop with a host round-trip per iteration; a single ~12-15 ms v2
        step is dispatch-latency-exposed, so between checkins the whole
        ``display_freq`` window runs device-side (VERDICT.md round-2
        next #1). Per-iteration keys are ``fold_in(key, state.step)`` —
        identical to the unchained schedule, so chained and stepwise runs
        agree (to float-reassociation tolerance across the two compiled
        programs)."""

        def body(st, _):
            it_key = jax.random.fold_in(key, st.step)
            return self._step_body(
                vq_params, clip_params, st, it_key, embeds, weights, stops
            )

        # IMAGEGEN_CHAIN_UNROLL replicates the step body inside the scan,
        # shrinking per-iteration loop bookkeeping and giving XLA a wider
        # window to overlap across iterations; A/B-measured (see
        # benchmarks/PROFILE_v2_r03.md) before changing the default.
        import os

        unroll = int(os.environ.get("IMAGEGEN_CHAIN_UNROLL", "1"))
        return jax.lax.scan(body, state, None, length=n, unroll=max(1, unroll))

    def chain(self, state: LatentState, n: int, key, embeds, weights, stops):
        """Run ``n`` fused iterations in one dispatch; returns
        (new_state, per-iteration losses (n, B, P))."""
        return self._chain_impl(
            self.vqgan_params, self.clip_params, state, n, key,
            embeds, weights, stops,
        )

    # ---------------------------------------------------------------- run
    def run(
        self,
        state: LatentState,
        key: jax.Array,
        embeds,
        weights,
        stops,
        iterations: int,
        display_freq: int = 20,
        checkin=None,
        progress=None,
        state_callback=None,
    ) -> LatentState:
        """Driver loop: each ``display_freq`` window of iterations runs as
        ONE device dispatch (``chain``); the host only syncs at checkins.
        The reference syncs every iteration via tqdm/loss prints —
        dispatch amortization is the TPU-shaped redesign of its hot loop
        (generate.py:167-180, VERDICT.md round-2 next #1). Key schedule is
        identical to stepping one iteration at a time.

        ``progress(done, total, last_losses)`` is the per-chain progress
        surface (the reference's visible tqdm contract,
        generate.py:185-188): called once per chain window with the LAST
        iteration's per-prompt losses (B, P). The losses of window k are
        fetched only after window k+1 is enqueued, so progress costs no
        device idle time.

        ``state_callback(iters_done, state)`` is the resume surface
        (round 5): called at the checkin cadence and once more with the
        final state. The state it receives is a device COPY snapshotted
        before the next chain donates the live buffers, and the callback
        runs after that chain is enqueued — so fetching it (e.g.
        ``save_latent_state``) overlaps device compute like the checkin
        readbacks do."""
        i = 0
        pending = None  # (iters_done, device losses of the finished chain)
        last_state_save = None
        while True:
            do_checkin = (
                checkin is not None or state_callback is not None
            ) and i % display_freq == 0
            saved = None
            if do_checkin and state_callback is not None:
                # tiny (z + Adam moments); copied so the chain below can
                # donate the live state
                saved = (i, jax.tree.map(jnp.copy, state))
            if do_checkin and checkin is not None:
                # dispatch only — the host fetch happens AFTER the next
                # chain is enqueued, so the readback round-trip overlaps
                # device compute instead of stalling it (donation of
                # state.z by the chain is safe: the runtime retires
                # pending readers before reusing a donated buffer)
                imgs = self.synth(state.z)
                losses = self._losses_impl(
                    self.vqgan_params, self.clip_params,
                    state.z, jax.random.fold_in(key, i), embeds, weights, stops,
                )
            if i < iterations:
                n = min(display_freq - i % display_freq, iterations - i)
                state, chain_losses = self.chain(
                    state, n, key, embeds, weights, stops
                )
            if pending is not None and progress is not None:
                done, dev_losses = pending
                progress(done, iterations, np.asarray(dev_losses))
            pending = (i + n, chain_losses[-1]) if i < iterations else None
            if do_checkin and checkin is not None:
                checkin(i, np.asarray(imgs), np.asarray(losses))
            if saved is not None:
                state_callback(*saved)
                last_state_save = saved[0]
            if i >= iterations:
                # the final chain's progress was flushed above on this
                # pass (pending only becomes None after the flush), so
                # nothing is left to report
                break
            i += n
        if state_callback is not None and last_state_save != iterations:
            state_callback(iterations, state)
        return state


def save_latent_state(path: str, iters_done: int, state: LatentState) -> None:
    """Atomic npz snapshot of a LatentState plus its completed-iteration
    count — the v2 resume surface (round 5; a capability the reference
    does not have: its v2 path checkpoints nothing, output images are
    the only artifact, generate.py:184-195). Saved as flattened pytree
    leaves so the layout tracks whatever optimizer state optax carries,
    with no structure-specific coupling. Write is tmp+rename so an
    interrupt mid-save cannot corrupt an existing snapshot."""
    leaves = [np.asarray(x) for x in jax.tree.leaves(state)]
    payload = {f"leaf_{i}": a for i, a in enumerate(leaves)}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(
            f,
            iters_done=np.int64(iters_done),
            n_leaves=np.int64(len(leaves)),
            **payload,
        )
    import os

    os.replace(tmp, path)


def load_latent_state(path: str, template: LatentState):
    """Restore ``(iters_done, LatentState)`` written by
    :func:`save_latent_state`. ``template`` supplies the pytree
    structure, dtypes, and shardings (build it with
    ``engine.init_state(z)`` for the same geometry); leaf shapes are
    validated so a resume against a different size/batch/optimizer
    fails with a clear error instead of corrupt math."""
    with np.load(path) as d:
        iters_done = int(d["iters_done"])
        n = int(d["n_leaves"])
        loaded = [d[f"leaf_{i}"] for i in range(n)]
    t_leaves, tdef = jax.tree.flatten(template)
    if len(t_leaves) != n:
        raise ValueError(
            f"state file {path} holds {n} leaves; the current engine "
            f"state has {len(t_leaves)} — different optimizer or version"
        )
    restored = []
    for k, (got, want) in enumerate(zip(loaded, t_leaves)):
        if tuple(got.shape) != tuple(jnp.shape(want)):
            raise ValueError(
                f"state leaf {k}: file shape {tuple(got.shape)} != "
                f"expected {tuple(jnp.shape(want))} (different image "
                "size, batch, or codebook geometry)"
            )
        want = jnp.asarray(want)
        restored.append(jax.device_put(got.astype(want.dtype), want.sharding))
    return iters_done, jax.tree.unflatten(tdef, restored)


def pad_prompt_specs(
    embed_list: list[np.ndarray],
    weight_list: list[float],
    stop_list: list[float],
    pad_to: int | None = None,
):
    """Stack per-prompt embeddings into fixed-shape (1, P, D) arrays with
    zero-weight padding (so batches with different prompt counts share
    one compiled step)."""
    P = pad_to or max(1, len(embed_list))
    D = embed_list[0].shape[-1] if embed_list else 1
    embeds = np.zeros((1, P, D), np.float32)
    weights = np.zeros((1, P), np.float32)
    stops = np.full((1, P), -np.inf, np.float32)
    for i, (e, w, s) in enumerate(zip(embed_list, weight_list, stop_list)):
        embeds[0, i] = e
        weights[0, i] = w
        stops[0, i] = s
    return embeds, weights, stops
