"""Stage-II training system: 256px refinement WGAN-GP stacked on the
frozen Stage-I generator — the primary benchmark config (BASELINE.md).

Capability match for ``/root/reference/stage_2_train_fn.py:20-239``:

* Frozen (eval-mode, no grads): text encoder, projection head, CA1, G1 —
  loaded from the Stage-I checkpoint (reference :52-72; the reference's
  loader crashes on an undefined ``blob`` at :67 — fixed here).
* Trained: CA2, Stage-II generator (64→256px), Stage-II critic.
* Per critic iteration: frozen text→CA1→G1 (64px) → CA2 → G2 (256px) →
  3 critic forwards + gradient penalty → critic Adam update; then one
  generator-side update of (G2, CA2) with the KL term on (mu2, sigma2).

Deliberate divergence from the reference (documented, SURVEY.md §2): the
reference's stage-2 generator step reuses grad buffers accumulated by the
five preceding critic backwards (it only zeroes ``opt_gen_2`` *after*
stepping, stage_2_train_fn.py:163-168), so G2/CA2 updates are
contaminated by critic-loss gradients. Functional JAX gradients are
always clean; we implement the uncontaminated update.

Like Stage-I, the whole step (5 critic updates + generator update)
compiles to one XLA graph and runs SPMD over the ``data`` mesh axis.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from imagegenerator_tpu.models.bert import BertConfig, BertEncoder
from imagegenerator_tpu.models.con_augment import ConditioningAugmentation
from imagegenerator_tpu.models.stackgan import (
    StageIGenerator,
    StageIIDiscriminator,
    StageIIGenerator,
)
from imagegenerator_tpu.ops.layers import Dense
from imagegenerator_tpu.train import losses, schedules
from imagegenerator_tpu.train.stage1 import Stage1Config, Stage1State


@dataclasses.dataclass(frozen=True)
class Stage2Config:
    tem_size: int = 512
    c_dim: int = 128
    z_dim: int = 100
    nd: int = 128
    h_dim: int = 256
    n_critic: int = 5
    lambda_gp: float = 10.0
    lr: float = 1e-3
    sched_step: int = 100
    sched_gamma: float = 0.5
    kl_mode: str = "correct"
    seq_len: int = 128
    num_residual: int = 4
    # Rematerialize critic forwards (FLOPs for activation memory).
    remat: bool = False
    # lax.scan unroll factor for the critic inner loop (see stage1).
    unroll_critic: int = 1
    # Architecture depth/width (see models.stackgan). Stage-1 (frozen
    # stack) resolution = 2**(len(gen1_channels)+2); stage-2 output
    # resolution = res1/4 * 2**(len(g2_up_channels)+1). Defaults are the
    # reference 64→256px pipeline.
    gen1_channels: tuple = (192, 96, 48, 24)
    g2_in_channels: int = 128
    g2_feat_channels: int = 512
    g2_res_channels: int = 320
    g2_up_channels: tuple = (320, 160, 80)
    d2_channels: tuple = (16, 32, 64, 128, 256, 512)
    bert: BertConfig = dataclasses.field(default_factory=BertConfig)
    compute_dtype: Any = None

    @property
    def res1(self) -> int:
        """Stage-1 (input) resolution."""
        return 2 ** (len(self.gen1_channels) + 2)

    @property
    def resolution(self) -> int:
        """Stage-2 (output) resolution."""
        return self.res1 // 4 * 2 ** (len(self.g2_up_channels) + 1)

    @classmethod
    def tiny(cls, **kw) -> "Stage2Config":
        """Tiny widths AND a 16→32px pyramid (vs the full 64→256px):
        round-1 tiny kept full spatial dims and took 7+ min to compile on
        CPU (VERDICT.md 'What's weak' #2)."""
        defaults = dict(
            tem_size=32,
            c_dim=16,
            z_dim=12,
            nd=16,
            h_dim=16,
            seq_len=8,
            num_residual=1,
            gen1_channels=(24, 12),
            g2_in_channels=8,
            g2_feat_channels=16,
            g2_res_channels=8,
            g2_up_channels=(16, 8),
            d2_channels=(8, 16, 32),
            bert=BertConfig.tiny(),
        )
        defaults.update(kw)
        return cls(**defaults)

    def stage1_config(self, **kw) -> Stage1Config:
        return Stage1Config(
            tem_size=self.tem_size,
            c_dim=self.c_dim,
            z_dim=self.z_dim,
            nd=self.nd,
            h_dim=self.h_dim,
            seq_len=self.seq_len,
            gen_channels=self.gen1_channels,
            bert=self.bert,
            compute_dtype=self.compute_dtype,
            **kw,
        )


class Stage2State(struct.PyTreeNode):
    # frozen stage-1 stack (params + G1 batch stats for eval-mode BN)
    frozen_params: dict
    frozen_gen_stats: dict
    # trained modules
    params: dict  # {'con_augment_2', 'generator', 'critic'}
    batch_stats: dict  # {'generator', 'critic'}
    opt_state: dict
    step: jax.Array


TRAINED = ("con_augment_2", "generator", "critic")


class Stage2System:
    def __init__(self, config: Stage2Config):
        self.config = config
        c = config
        # frozen stack (same architectures as stage 1)
        self.encoder = BertEncoder(c.bert, dtype=c.compute_dtype)
        self.projection = Dense(c.tem_size, dtype=c.compute_dtype)
        self.con_augment_1 = ConditioningAugmentation(h_dim=c.h_dim, c_dim=c.c_dim)
        self.gen_1 = StageIGenerator(
            c_dim=c.c_dim,
            z_dim=c.z_dim,
            channels=c.gen1_channels,
            dtype=c.compute_dtype,
        )
        # trained modules
        self.con_augment_2 = ConditioningAugmentation(h_dim=c.h_dim, c_dim=c.c_dim)
        self.gen_2 = StageIIGenerator(
            num_residual=c.num_residual,
            in_channels=c.g2_in_channels,
            feat_channels=c.g2_feat_channels,
            res_channels=c.g2_res_channels,
            up_channels=c.g2_up_channels,
            dtype=c.compute_dtype,
        )
        self.critic_2 = StageIIDiscriminator(
            tem_size=c.tem_size,
            nd=c.nd,
            channels=c.d2_channels,
            dtype=c.compute_dtype,
        )
        # Critic StepLR boundary scaled by n_critic: the critic optimizer
        # updates n_critic times per batch, so decaying at
        # sched_step * n_critic updates keeps its LR synchronized with the
        # generator's per-batch schedule (see stage1.Stage1System).
        self.tx = {
            name: schedules.adam_with_steplr(c.lr, c.sched_step, c.sched_gamma)
            for name in ("con_augment_2", "generator")
        }
        self.tx["critic"] = schedules.adam_with_steplr(
            c.lr, c.sched_step * c.n_critic, c.sched_gamma
        )

    # ------------------------------------------------------------------
    def init(self, key: jax.Array, batch_size: int) -> Stage2State:
        c = self.config
        keys = jax.random.split(key, 8)
        tokens = jnp.zeros((batch_size, c.seq_len), jnp.int32)
        mask = jnp.ones((batch_size, c.seq_len), jnp.int32)
        tem = jnp.zeros((batch_size, c.tem_size), jnp.float32)
        latent = jnp.zeros((batch_size, c.c_dim + c.z_dim), jnp.float32)
        img64 = jnp.zeros((batch_size, c.res1, c.res1, 3), jnp.float32)
        img256 = jnp.zeros((batch_size, c.resolution, c.resolution, 3), jnp.float32)
        c_hat = jnp.zeros((batch_size, c.c_dim), jnp.float32)

        enc = self.encoder.init({"params": keys[0], "dropout": keys[0]}, tokens, mask)
        proj = self.projection.init(keys[1], jnp.zeros((1, c.bert.hidden_size)))
        ca1 = self.con_augment_1.init({"params": keys[2], "noise": keys[2]}, tem)
        g1 = self.gen_1.init(keys[3], latent, train=False)
        ca2 = self.con_augment_2.init({"params": keys[4], "noise": keys[4]}, tem)
        g2 = self.gen_2.init(keys[5], img64, c_hat, train=False)
        d2 = self.critic_2.init(keys[6], img256, tem, train=False)

        params = {
            "con_augment_2": ca2["params"],
            "generator": g2["params"],
            "critic": d2["params"],
        }
        return Stage2State(
            frozen_params={
                "encoder": enc["params"],
                "projection": proj["params"],
                "con_augment_1": ca1["params"],
                "gen_1": g1["params"],
            },
            frozen_gen_stats=g1["batch_stats"],
            params=params,
            batch_stats={"generator": g2["batch_stats"], "critic": d2["batch_stats"]},
            opt_state={m: self.tx[m].init(params[m]) for m in TRAINED},
            step=jnp.zeros((), jnp.int32),
        )

    def load_stage1(self, state: Stage2State, stage1_state: Stage1State) -> Stage2State:
        """Hand off the frozen stack from a trained Stage-I state
        (the JAX analog of stage_2_train_fn.py:65-72's checkpoint load)."""
        return state.replace(
            frozen_params={
                "encoder": stage1_state.params["encoder"],
                "projection": stage1_state.params["projection"],
                "con_augment_1": stage1_state.params["con_augment"],
                "gen_1": stage1_state.params["generator"],
            },
            frozen_gen_stats=stage1_state.batch_stats["generator"],
        )

    # ------------------------------------------------------------------
    def _frozen_64(self, frozen_params, frozen_gen_stats, tokens, mask, k_ca, k_z):
        """Frozen text→CA1→G1 pipeline in eval mode (reference :52-63,
        121-128). Returns (tem, fake_64); CA1 still samples noise (it has
        no train/eval distinction)."""
        hidden = self.encoder.apply(
            {"params": frozen_params["encoder"]}, tokens, mask, deterministic=True
        )
        tem = self.projection.apply(
            {"params": frozen_params["projection"]},
            hidden[:, 0, :].astype(jnp.float32),
        )
        return tem, self._frozen_64_from_tem(
            frozen_params, frozen_gen_stats, tem, k_ca, k_z
        )

    def _frozen_64_from_tem(self, frozen_params, frozen_gen_stats, tem, k_ca, k_z):
        """CA1 → G1 half of the frozen pipeline, from a (possibly
        precomputed) text embedding."""
        c = self.config
        c_hat1, _, _ = self.con_augment_1.apply(
            {"params": frozen_params["con_augment_1"]}, tem, rngs={"noise": k_ca}
        )
        z = jax.random.normal(k_z, (tem.shape[0], c.z_dim), jnp.float32)
        fake_64 = self.gen_1.apply(
            {"params": frozen_params["gen_1"], "batch_stats": frozen_gen_stats},
            jnp.concatenate([c_hat1, z], axis=1),
            train=False,
        )
        return jax.lax.stop_gradient(fake_64)

    def _gen2_forward(self, params, gen_stats, fake_64, tem, k_ca2):
        c_hat2, mu2, sigma2 = self.con_augment_2.apply(
            {"params": params["con_augment_2"]}, tem, rngs={"noise": k_ca2}
        )
        fake_256, mut = self.gen_2.apply(
            {"params": params["generator"], "batch_stats": gen_stats},
            fake_64,
            c_hat2,
            train=True,
            mutable=["batch_stats"],
        )
        return fake_256, mu2, sigma2, mut["batch_stats"]

    def _critic_apply(self, critic_params, critic_stats, img, tem):
        def fwd(cp, cs, im, t):
            scores, mut = self.critic_2.apply(
                {"params": cp, "batch_stats": cs},
                im,
                t,
                train=True,
                mutable=["batch_stats"],
            )
            return scores.reshape(-1).astype(jnp.float32), mut["batch_stats"]

        if self.config.remat:
            fwd = jax.checkpoint(fwd)
        return fwd(critic_params, critic_stats, img, tem)

    def _critic_tower(self, critic_params, critic_stats, img):
        """Image tower only — see stage1._critic_tower for the fusion
        rationale (score-identical to separate forwards)."""

        def fwd(cp, cs, im):
            feat, mut = self.critic_2.apply(
                {"params": cp, "batch_stats": cs},
                im,
                train=True,
                method=StageIIDiscriminator.features,
                mutable=["batch_stats"],
            )
            return feat, mut["batch_stats"]

        if self.config.remat:
            fwd = jax.checkpoint(fwd)
        return fwd(critic_params, critic_stats, img)

    def _critic_head(self, critic_params, feat, tem):
        scores = self.critic_2.apply(
            {"params": critic_params},
            feat,
            tem,
            method=StageIIDiscriminator.score,
        )
        return scores.reshape(-1).astype(jnp.float32)

    # ------------------------------------------------------------------
    def train_step(
        self,
        state: Stage2State,
        batch: dict,
        key: jax.Array,
        axis_name: str | None = None,
    ):
        """batch: {'input_ids', 'attention_mask', 'image': (B,256,256,3)}
        — or, with precomputed caption embeddings (the frozen encoder
        makes them per-caption constants; BASELINE.json config 1),
        {'tem': (B, tem_size), 'image': ...}."""
        c = self.config
        real = batch["image"]
        if real.dtype == jnp.uint8:
            # Device-side normalize: the loader ships resampled uint8
            # (4x fewer H2D bytes than f32) and the step maps it to
            # [-1, 1] here — same formula the host normalize fuses
            # (native/host_ops.cpp kScale), traced statically on dtype.
            real = real.astype(jnp.float32) * (2.0 / 255.0) - 1.0
        bsz = real.shape[0]

        def pmean(tree):
            return tree if axis_name is None else jax.lax.pmean(tree, axis_name)

        k_perm, k_loop = jax.random.split(key)
        perm = jax.random.permutation(k_perm, bsz)
        iter_keys = jax.random.split(k_loop, c.n_critic)

        if "tem" in batch:
            # Precomputed text embeddings: the mismatched condition is
            # just the same embeddings under the shared-key permutation.
            tem = jax.lax.stop_gradient(batch["tem"].astype(jnp.float32))
            tem_mis = tem[perm]
        else:
            tokens, mask = batch["input_ids"], batch["attention_mask"]
            # Frozen text embeddings: encoder is eval-mode + frozen, so tem
            # is loop-invariant — ONE batch-B forward reused across all
            # critic iterations (the reference recomputes 2 BERT forwards
            # per iteration). The mismatched condition is the SAME
            # captions permuted, and eval-mode BERT is deterministic, so
            # tem_mis = tem[perm] exactly — round 2 ran a doubled-batch
            # (matched+mismatched) forward, i.e. 2x the needed encoder
            # FLOPs (VERDICT.md round-2 next #8).
            hidden = self.encoder.apply(
                {"params": state.frozen_params["encoder"]},
                tokens,
                mask,
                deterministic=True,
            )
            tem = self.projection.apply(
                {"params": state.frozen_params["projection"]},
                hidden[:, 0, :].astype(jnp.float32),
            )
            tem = jax.lax.stop_gradient(tem)
            tem_mis = tem[perm]

        def frozen_64(k_ca1, k_z):
            c_hat1, _, _ = self.con_augment_1.apply(
                {"params": state.frozen_params["con_augment_1"]},
                tem,
                rngs={"noise": k_ca1},
            )
            z = jax.random.normal(k_z, (bsz, c.z_dim), jnp.float32)
            fake_64 = self.gen_1.apply(
                {
                    "params": state.frozen_params["gen_1"],
                    "batch_stats": state.frozen_gen_stats,
                },
                jnp.concatenate([c_hat1, z], axis=1),
                train=False,
            )
            return jax.lax.stop_gradient(fake_64)

        # ---------------- critic inner loop ----------------
        def critic_iter(carry, it_key):
            critic_params, critic_opt, gen_stats, critic_stats = carry
            k_ca1, k_z, k_ca2, k_gp = jax.random.split(it_key, 4)

            fake_64 = frozen_64(k_ca1, k_z)
            trained = dict(state.params)
            fake_256, _mu2, _s2, gen_stats = self._gen2_forward(
                trained, gen_stats, fake_64, tem, k_ca2
            )
            fake_256 = jax.lax.stop_gradient(fake_256)

            def loss_fn(cp):
                feat_real, st1 = self._critic_tower(cp, critic_stats, real)
                feat_fake, st2 = self._critic_tower(cp, st1, fake_256)
                s_real = self._critic_head(cp, feat_real, tem)
                s_mis = self._critic_head(cp, feat_real, tem_mis)
                s_fake = self._critic_head(cp, feat_fake, tem)

                def gp_critic(images):
                    feat, st = self._critic_tower(cp, st2, images)
                    return self._critic_head(cp, feat, tem), st

                gp, st3 = losses.gradient_penalty_aux(
                    gp_critic, real, fake_256, k_gp
                )

                neg = jnp.concatenate([s_mis, s_fake], axis=0)
                loss = losses.wgan_critic_loss(s_real, neg) + c.lambda_gp * gp
                return loss, (st3, gp)

            (loss_d, (critic_stats, gp)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(critic_params)
            grads = pmean(grads)
            updates, critic_opt = self.tx["critic"].update(
                grads, critic_opt, critic_params
            )
            critic_params = optax.apply_updates(critic_params, updates)
            return (critic_params, critic_opt, gen_stats, critic_stats), (loss_d, gp)

        carry0 = (
            state.params["critic"],
            state.opt_state["critic"],
            state.batch_stats["generator"],
            state.batch_stats["critic"],
        )
        (critic_params, critic_opt, gen_stats, critic_stats), (d_losses, gps) = (
            jax.lax.scan(critic_iter, carry0, iter_keys, unroll=c.unroll_critic)
        )

        # ---------------- generator-side update (G2 + CA2) ----------------
        k_ca1_l, k_z_l, k_ca2_l, _ = jax.random.split(iter_keys[-1], 4)
        fake_64_l = frozen_64(k_ca1_l, k_z_l)

        def gen_loss_fn(trained_params):
            params = dict(state.params)
            params.update(trained_params)
            fake_256, mu2, sigma2, gstats = self._gen2_forward(
                params, gen_stats, fake_64_l, tem, k_ca2_l
            )
            s_fake, cstats = self._critic_apply(
                critic_params, critic_stats, fake_256, tem
            )
            kl = losses.kl_term(mu2, sigma2, c.kl_mode)
            loss = losses.wgan_generator_loss(s_fake) + kl
            return loss, (gstats, cstats, kl, fake_256)

        gen_side = {m: state.params[m] for m in ("con_augment_2", "generator")}
        (loss_g, (gen_stats, critic_stats, kl, fake_256)), gen_grads = (
            jax.value_and_grad(gen_loss_fn, has_aux=True)(gen_side)
        )
        gen_grads = pmean(gen_grads)

        new_params = dict(state.params)
        new_opt = dict(state.opt_state)
        for m in ("con_augment_2", "generator"):
            updates, new_opt[m] = self.tx[m].update(
                gen_grads[m], state.opt_state[m], state.params[m]
            )
            new_params[m] = optax.apply_updates(state.params[m], updates)
        new_params["critic"] = critic_params
        new_opt["critic"] = critic_opt

        metrics = pmean(
            {
                "loss_critic": d_losses[-1],
                "loss_gen": loss_g,
                "gp": gps[-1],
                "kl": kl,
            }
        )

        return (
            Stage2State(
                frozen_params=state.frozen_params,
                frozen_gen_stats=state.frozen_gen_stats,
                params=new_params,
                batch_stats={"generator": gen_stats, "critic": critic_stats},
                opt_state=new_opt,
                step=state.step + 1,
            ),
            metrics,
        )

    # ------------------------------------------------------------------
    def embed_texts(self, state: Stage2State, tokens, mask) -> jax.Array:
        """Precompute caption embeddings through the frozen encoder +
        projection (cacheable: the stage-2 encoder never updates). Feed
        the result as ``batch['tem']`` to skip the per-step BERT forward.
        """
        hidden = self.encoder.apply(
            {"params": state.frozen_params["encoder"]},
            tokens,
            mask,
            deterministic=True,
        )
        return self.projection.apply(
            {"params": state.frozen_params["projection"]},
            hidden[:, 0, :].astype(jnp.float32),
        )

    # ------------------------------------------------------------------
    def sample(self, state: Stage2State, batch: dict, key: jax.Array):
        """Fixed-noise 256px sample generation (the reference's
        TensorBoard image path, stage_2_train_fn.py:181-208). Accepts
        token batches ({'input_ids','attention_mask'}) or
        precomputed-embedding batches ({'tem'}), like train_step."""
        k_ca1, k_z, k_ca2 = jax.random.split(key, 3)
        if "tem" in batch:
            tem = batch["tem"].astype(jnp.float32)
            fake_64 = self._frozen_64_from_tem(
                state.frozen_params, state.frozen_gen_stats, tem, k_ca1, k_z
            )
        else:
            tem, fake_64 = self._frozen_64(
                state.frozen_params,
                state.frozen_gen_stats,
                batch["input_ids"],
                batch["attention_mask"],
                k_ca1,
                k_z,
            )
        c_hat2, _, _ = self.con_augment_2.apply(
            {"params": state.params["con_augment_2"]}, tem, rngs={"noise": k_ca2}
        )
        return self.gen_2.apply(
            {
                "params": state.params["generator"],
                "batch_stats": state.batch_stats["generator"],
            },
            fake_64,
            c_hat2,
            train=False,
        )


def make_train_step(
    system: Stage2System, mesh: Mesh | None = None, donate: bool = True
):
    donate_argnums = (0,) if donate else ()
    if mesh is None:
        fn = functools.partial(system.train_step, axis_name=None)
        return jax.jit(fn, donate_argnums=donate_argnums)
    per_shard = functools.partial(system.train_step, axis_name="data")
    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=donate_argnums)
