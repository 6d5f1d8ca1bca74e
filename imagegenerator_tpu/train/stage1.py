"""Stage-I training system: one jitted SPMD train step for the 64px
text-conditioned WGAN-GP.

Capability match for ``/root/reference/stage_1_train_fn.py:92-196`` +
``train.py:60-164``, redesigned TPU-first:

* The whole per-batch computation — ``n_critic=5`` critic updates
  (text encode ×2, CA, G fwd, 3 critic fwds, second-order gradient
  penalty, Adam update) followed by the generator/encoder/projection/CA
  update — compiles to ONE XLA graph. The reference cuts its lazy graph at
  every ``xm.optimizer_step`` / ``.item()``; here there are zero host
  syncs inside the step.
* The critic inner loop is a ``lax.scan`` over per-iteration PRNG keys.
* Matched + mismatched captions run through the text encoder as one
  doubled batch (2B) — one MXU-efficient forward instead of two
  (semantics-preserving: BERT has no batch-coupled ops).
* Data parallelism: the step is written per-shard; gradients are
  ``lax.pmean``-reduced over the ``data`` mesh axis under ``shard_map``.
  BatchNorm stays per-replica, matching torch_xla per-core BN.
* RNG: a single key threads the step; replicas receive the same key, so
  noise/permutations are shared across replicas exactly like the
  reference's seed all-reduce (stage_1_train_fn.py:98-106) — but with no
  collective and no host sync.
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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from imagegenerator_tpu.models.bert import BertConfig, BertEncoder
from imagegenerator_tpu.models.con_augment import ConditioningAugmentation
from imagegenerator_tpu.models.stackgan import StageIDiscriminator, StageIGenerator
from imagegenerator_tpu.ops.layers import Dense
from imagegenerator_tpu.train import losses, schedules


@dataclasses.dataclass(frozen=True)
class Stage1Config:
    """Hyperparameters; defaults mirror ``/root/reference/train.py:31-37``
    and ``stage_1_train_fn.py:14-16``."""

    tem_size: int = 512
    c_dim: int = 128
    z_dim: int = 100
    nd: int = 128
    h_dim: int = 256
    n_critic: int = 5
    lambda_gp: float = 10.0
    lr: float = 1e-3
    encoder_lr: float = 5e-5
    sched_step: int = 100
    sched_gamma: float = 0.5
    # 'correct' = +2*KL penalty; 'faithful' = the reference's inverted sign
    # (stage_1_train_fn.py:156-159). See SURVEY.md §2.
    kl_mode: str = "correct"
    # Reference runs the text encoder in train mode => dropout active.
    # With dropout OFF the matched/mismatched text forward is
    # loop-invariant across the critic iterations and is hoisted out of
    # the scan (exact semantics, ~n_critic x fewer encoder forwards).
    text_dropout: bool = True
    # The encoder only LEARNS through the generator step — the critic
    # loop uses tem as a stopped-gradient input — so the reference's
    # per-critic-iteration BERT re-forwards (stage_1_train_fn.py:117-123)
    # only resample dropout noise. Profiled on v5e the step is 93% BERT,
    # and those re-forwards are most of it. Default: sample dropout ONCE
    # per batch and run ONE vjp-saved text forward per step, reused by
    # the critic loop and the generator backward (~8 -> 3 BERT
    # forward-equivalents). True restores per-iteration resampling.
    text_resample_per_iter: bool = False
    # Reuse the matched-caption embeddings for the mismatched pairs
    # (tem_mis = tem[perm]) instead of encoding the permuted copies as a
    # second half-batch — HALVES the dominant text-encoder cost, the
    # same reuse the stage-2 token path ships (stage2.py, round-3).
    # None (default) = AUTO: on when text_dropout is False, where it is
    # mathematically EXACT (the permuted rows would compute identical
    # embeddings); off when dropout is active, because the reference
    # draws fresh dropout noise for the mismatched forward
    # (stage_1_train_fn.py:117-123). True applies it under dropout too:
    # each mismatched pair then shares its matched twin's dropout sample
    # — a different noise structure than the reference's, semantically a
    # cleaner "mismatched caption" (the critic sees exactly another
    # sample's embedding). Ignored by the reference-faithful
    # text_resample_per_iter branch.
    text_reuse_mismatched: bool | None = None
    # Rematerialize generator/critic forwards in the loss functions to
    # trade FLOPs for activation memory (larger per-chip batches).
    remat: bool = False
    # lax.scan unroll factor for the critic inner loop. Unrolling lets
    # XLA overlap iteration i+1's generator forward (independent of the
    # critic params) with iteration i's critic backward.
    unroll_critic: int = 1
    seq_len: int = 128
    # Architecture depth/width (see models.stackgan): resolution =
    # 2**(len(gen_channels) + 2); defaults are the reference's 64px nets.
    gen_channels: tuple = (192, 96, 48, 24)
    disc_channels: tuple = (64, 128, 256, 512)
    bert: BertConfig = dataclasses.field(default_factory=BertConfig)
    compute_dtype: Any = None  # e.g. jnp.bfloat16 for TPU throughput

    @property
    def resolution(self) -> int:
        return 2 ** (len(self.gen_channels) + 2)

    @classmethod
    def tiny(cls, **kw) -> "Stage1Config":
        """Small config for CPU tests (BASELINE.json config 1): tiny
        widths AND a 16px pyramid — spatial size dominated round-1 CPU
        compile times (VERDICT.md), so tiny must shrink it too."""
        defaults = dict(
            tem_size=32,
            c_dim=16,
            z_dim=12,
            nd=16,
            h_dim=16,
            seq_len=8,
            gen_channels=(24, 12),
            disc_channels=(12, 24),
            bert=BertConfig.tiny(),
        )
        defaults.update(kw)
        return cls(**defaults)


class Stage1State(struct.PyTreeNode):
    params: dict
    batch_stats: dict
    opt_state: dict
    step: jax.Array


MODULES = ("encoder", "projection", "con_augment", "generator", "critic")
GEN_SIDE = ("encoder", "projection", "con_augment", "generator")


class Stage1System:
    """Bundles the five modules + per-module optimizers, provides
    ``init`` and a pure ``train_step``."""

    def __init__(self, config: Stage1Config):
        self.config = config
        c = config
        self.encoder = BertEncoder(c.bert, dtype=c.compute_dtype)
        self.projection = Dense(c.tem_size, dtype=c.compute_dtype)
        self.con_augment = ConditioningAugmentation(h_dim=c.h_dim, c_dim=c.c_dim)
        self.generator = StageIGenerator(
            c_dim=c.c_dim,
            z_dim=c.z_dim,
            channels=c.gen_channels,
            dtype=c.compute_dtype,
        )
        self.critic = StageIDiscriminator(
            tem_size=c.tem_size,
            nd=c.nd,
            channels=c.disc_channels,
            dtype=c.compute_dtype,
        )
        # optax schedules are evaluated at the optimizer's own update
        # count; the critic updates n_critic times per batch, so its
        # StepLR boundary must scale by n_critic to stay synchronized
        # with the reference's per-batch scheduler stepping
        # (stage_1_train_fn.py:187-192): the critic at batch b has done
        # b*n_critic updates, and floor((b*n+i)/(step*n)) == floor(b/step)
        # for every inner iteration i < n — exact equivalence.
        self.tx = {
            "encoder": schedules.adamw_with_steplr(
                c.encoder_lr, c.sched_step, c.sched_gamma
            ),
            **{
                name: schedules.adam_with_steplr(c.lr, c.sched_step, c.sched_gamma)
                for name in ("projection", "con_augment", "generator")
            },
            "critic": schedules.adam_with_steplr(
                c.lr, c.sched_step * c.n_critic, c.sched_gamma
            ),
        }

    # ------------------------------------------------------------------
    def init(self, key: jax.Array, batch_size: int) -> Stage1State:
        c = self.config
        keys = jax.random.split(key, 6)
        tokens = jnp.zeros((batch_size, c.seq_len), jnp.int32)
        mask = jnp.ones((batch_size, c.seq_len), jnp.int32)
        tem = jnp.zeros((batch_size, c.tem_size), jnp.float32)
        latent = jnp.zeros((batch_size, c.c_dim + c.z_dim), jnp.float32)
        img = jnp.zeros((batch_size, c.resolution, c.resolution, 3), jnp.float32)

        enc = self.encoder.init(
            {"params": keys[0], "dropout": keys[5]}, tokens, mask
        )
        proj = self.projection.init(keys[1], jnp.zeros((1, c.bert.hidden_size)))
        ca = self.con_augment.init({"params": keys[2], "noise": keys[2]}, tem)
        gen = self.generator.init(keys[3], latent, train=False)
        crit = self.critic.init(keys[4], img, tem, train=False)

        params = {
            "encoder": enc["params"],
            "projection": proj["params"],
            "con_augment": ca["params"],
            "generator": gen["params"],
            "critic": crit["params"],
        }
        batch_stats = {
            "generator": gen["batch_stats"],
            "critic": crit["batch_stats"],
        }
        opt_state = {m: self.tx[m].init(params[m]) for m in MODULES}
        return Stage1State(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------
    def encode_text(self, enc_params, proj_params, tokens, mask, dropout_key):
        """tokens -> tem (CLS hidden state -> 768->tem_size projection);
        reference stage_1_train_fn.py:117-119 + train.py:69."""
        deterministic = dropout_key is None or not self.config.text_dropout
        rngs = None if deterministic else {"dropout": dropout_key}
        hidden = self.encoder.apply(
            {"params": enc_params},
            tokens,
            mask,
            deterministic=deterministic,
            rngs=rngs,
        )
        cls = hidden[:, 0, :].astype(jnp.float32)
        return self.projection.apply({"params": proj_params}, cls)

    def _gen_forward(
        self, params, gen_stats, tem, k_ca, k_z, batch_size, train=True
    ):
        """CA -> z-noise -> G1. Returns (fake_64, mu, sigma, new_gen_stats);
        ``train=False`` uses the running BN stats and returns them
        unchanged (the eval path ``sample`` rides)."""
        c = self.config
        c_hat, mu, sigma = self.con_augment.apply(
            {"params": params["con_augment"]}, tem, rngs={"noise": k_ca}
        )
        z = jax.random.normal(k_z, (batch_size, c.z_dim), jnp.float32)
        latent = jnp.concatenate([c_hat, z], axis=1)
        variables = {"params": params["generator"], "batch_stats": gen_stats}
        if not train:
            return (
                self.generator.apply(variables, latent, train=False),
                mu, sigma, gen_stats,
            )
        fake, mut = self.generator.apply(
            variables, latent, train=True, mutable=["batch_stats"]
        )
        return fake, mu, sigma, mut["batch_stats"]

    def sample(self, state: "Stage1State", batch: dict, key: jax.Array):
        """64px sample generation from a trained state: deterministic
        text encode -> CA -> G1 in eval mode (the stage-1 analog of
        Stage2System.sample / the reference's fixed-noise TensorBoard
        image path, stage_2_train_fn.py:181-208 — the reference never
        wires a stage-1 sampler; this is the inference surface the
        training stack implies). Accepts {'input_ids','attention_mask'}
        or a precomputed {'tem'}."""
        k_ca, k_z = jax.random.split(key)
        if "tem" in batch:
            tem = batch["tem"].astype(jnp.float32)
        else:
            tem = self.encode_text(
                state.params["encoder"],
                state.params["projection"],
                batch["input_ids"],
                batch["attention_mask"],
                dropout_key=None,
            )
        fake, _, _, _ = self._gen_forward(
            state.params,
            state.batch_stats["generator"],
            tem, k_ca, k_z, tem.shape[0],
            train=False,
        )
        return fake

    def _critic_apply(self, critic_params, critic_stats, img, tem):
        """One critic forward in train mode; returns (scores, new_stats)."""

        def fwd(cp, cs, im, t):
            scores, mut = self.critic.apply(
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
        """Image tower only (train-mode BN). The head is stateless, so one
        tower pass can be scored against several text embeddings — the
        reference computes tower(real) twice, once per text condition
        (stage_1_train_fn.py:125-132); outputs are identical either way."""

        def fwd(cp, cs, im):
            feat, mut = self.critic.apply(
                {"params": cp, "batch_stats": cs},
                im,
                train=True,
                method=StageIDiscriminator.features,
                mutable=["batch_stats"],
            )
            return feat, mut["batch_stats"]

        if self.config.remat:
            fwd = jax.checkpoint(fwd)
        return fwd(critic_params, critic_stats, img)

    def _critic_head(self, critic_params, feat, tem):
        scores = self.critic.apply(
            {"params": critic_params},
            feat,
            tem,
            method=StageIDiscriminator.score,
        )
        return scores.reshape(-1).astype(jnp.float32)

    # ------------------------------------------------------------------
    def train_step(
        self,
        state: Stage1State,
        batch: dict,
        key: jax.Array,
        axis_name: str | None = None,
    ):
        """One full optimizer step (5 critic updates + 1 generator update).

        batch: {'input_ids': (B,T) i32, 'attention_mask': (B,T) i32,
                'image': (B,64,64,3) f32 in [-1,1]}
        Under ``shard_map`` the batch is the per-replica shard and
        ``axis_name='data'``; gradients are pmean-reduced.
        """
        c = self.config
        tokens = batch["input_ids"]
        mask = batch["attention_mask"]
        real = batch["image"]
        if real.dtype == jnp.uint8:
            # Device-side normalize: the loader ships resampled uint8
            # (4x fewer H2D bytes than f32) and the step maps it to
            # [-1, 1] here — same formula the host normalize fuses
            # (native/host_ops.cpp kScale), traced statically on dtype.
            real = real.astype(jnp.float32) * (2.0 / 255.0) - 1.0
        bsz = tokens.shape[0]

        def pmean(tree):
            if axis_name is None:
                return tree
            return jax.lax.pmean(tree, axis_name)

        k_perm, k_loop = jax.random.split(key)
        # Matching-aware negatives: shared-key caption permutation
        # (reference stage_1_train_fn.py:108-111).
        perm = jax.random.permutation(k_perm, bsz)
        tokens_mis = tokens[perm]
        mask_mis = mask[perm]

        # One key bundle per critic iteration + the keys the generator step
        # reuses so its recomputed graph is bit-identical to the saved
        # graph the reference backprops through.
        iter_keys = jax.random.split(k_loop, c.n_critic)

        tokens_2b = jnp.concatenate([tokens, tokens_mis], axis=0)
        mask_2b = jnp.concatenate([mask, mask_mis], axis=0)

        def text_fwd_both(params, k_drop):
            """Matched+mismatched captions in one doubled-batch forward."""
            tem_2b = self.encode_text(
                params["encoder"], params["projection"], tokens_2b, mask_2b, k_drop
            )
            return tem_2b[:bsz], tem_2b[bsz:]

        # Text forward policy (see Stage1Config.text_resample_per_iter):
        # unless per-iteration dropout resampling is requested, run the
        # doubled-batch text forward ONCE through jax.vjp — the critic
        # loop reads its (stopped-gradient) value and the generator step
        # pulls encoder/projection grads back through the saved residuals
        # instead of re-running the forward.
        # text_resample_per_iter=True ALWAYS takes the per-iteration
        # branch — even with dropout off, where the two are mathematically
        # identical — so the re-forward formulation stays independently
        # exercisable as a gradient oracle for the hoisted vjp plumbing
        # (tests/test_step_options.py; ADVICE.md round-2: the old
        # dropout-conditioned dispatch made that comparison vacuous).
        k_drop_hoist = jax.random.fold_in(k_loop, c.n_critic)
        reuse_mis = c.text_reuse_mismatched
        if reuse_mis is None:
            reuse_mis = not c.text_dropout  # exact when dropout is off
        hoisted_tems = None
        text_vjp = None
        vjp_doubled = False
        if not c.text_resample_per_iter:
            enc_proj = {
                "encoder": state.params["encoder"],
                "projection": state.params["projection"],
            }
            if reuse_mis:
                # matched rows only; mismatched = gather of the same
                # embeddings (Stage1Config.text_reuse_mismatched)
                def text_matched(ep):
                    return self.encode_text(
                        ep["encoder"],
                        ep["projection"],
                        tokens,
                        mask,
                        k_drop_hoist if c.text_dropout else None,
                    )

                text_fn = (
                    jax.checkpoint(text_matched) if c.remat else text_matched
                )
                tem_val, text_vjp = jax.vjp(text_fn, enc_proj)
                hoisted_tems = (tem_val, tem_val[perm])
            else:

                def text_both_2b(ep):
                    return self.encode_text(
                        ep["encoder"],
                        ep["projection"],
                        tokens_2b,
                        mask_2b,
                        k_drop_hoist if c.text_dropout else None,
                    )

                # remat: the vjp residuals are the doubled-batch BERT's
                # full activation stack, which caps the per-chip batch
                # (b256 OOMs at 16 GB with XLA attention); checkpointing
                # trades one recomputed forward for that memory, like
                # the gen/critic remat below.
                text_fn = (
                    jax.checkpoint(text_both_2b) if c.remat else text_both_2b
                )
                tem_val, text_vjp = jax.vjp(text_fn, enc_proj)
                hoisted_tems = (tem_val[:bsz], tem_val[bsz:])
                vjp_doubled = True

        # ---------------- critic inner loop (lax.scan) ----------------
        def critic_iter(carry, it_key):
            critic_params, critic_opt, gen_stats, critic_stats = carry
            k_drop, k_ca, k_z, k_gp = jax.random.split(it_key, 4)

            if hoisted_tems is not None:
                tem, tem_mis = hoisted_tems
            else:
                tem, tem_mis = text_fwd_both(state.params, k_drop)
            fake, _mu, _sigma, gen_stats = self._gen_forward(
                state.params, gen_stats, tem, k_ca, k_z, bsz
            )
            fake = jax.lax.stop_gradient(fake)
            tem_sg = jax.lax.stop_gradient(tem)
            tem_mis_sg = jax.lax.stop_gradient(tem_mis)

            # Fused critic forwards: tower(real) once scores both the
            # matched and mismatched conditions (stateless head), and the
            # GP forward's BN-stats update rides the input-gradient pass
            # via has_aux — score-identical to the reference's four
            # separate train-mode forwards (stage_1_train_fn.py:125-144).
            def loss_fn(cp):
                feat_real, st1 = self._critic_tower(cp, critic_stats, real)
                feat_fake, st2 = self._critic_tower(cp, st1, fake)
                s_real = self._critic_head(cp, feat_real, tem_sg)
                s_mis = self._critic_head(cp, feat_real, tem_mis_sg)
                s_fake = self._critic_head(cp, feat_fake, tem_sg)

                def gp_critic(images):
                    feat, st = self._critic_tower(cp, st2, images)
                    return self._critic_head(cp, feat, tem_sg), st

                gp, st3 = losses.gradient_penalty_aux(gp_critic, real, fake, k_gp)

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
            return (
                (critic_params, critic_opt, gen_stats, critic_stats),
                (loss_d, gp),
            )

        carry0 = (
            state.params["critic"],
            state.opt_state["critic"],
            state.batch_stats["generator"],
            state.batch_stats["critic"],
        )
        (critic_params, critic_opt, gen_stats, critic_stats), (d_losses, gps) = (
            jax.lax.scan(critic_iter, carry0, iter_keys, unroll=c.unroll_critic)
        )

        # ---------------- generator-side update ----------------
        # Reference gen step (stage_1_train_fn.py:154-172) backprops
        # through the LAST critic iteration's saved graph; we recompute it
        # with the same PRNG keys, against the post-update critic.
        k_drop_l, k_ca_l, k_z_l, _ = jax.random.split(iter_keys[-1], 4)

        if text_vjp is not None:
            # Hoisted path: differentiate w.r.t. (CA/generator params, tem)
            # and route the tem cotangent through the saved text vjp — no
            # encoder re-forward. Gradients are exact: tem feeds both the
            # generator (via CA) and the critic's text head, and the vjp
            # sums both paths.
            tem_full = hoisted_tems[0]

            def gen_loss_hoisted(sub_params, tem_in):
                params = dict(state.params)
                params.update(sub_params)
                fake, mu, sigma, gstats = self._gen_forward(
                    params, gen_stats, tem_in, k_ca_l, k_z_l, bsz
                )
                s_fake, cstats = self._critic_apply(
                    critic_params, critic_stats, fake, tem_in
                )
                kl = losses.kl_term(mu, sigma, c.kl_mode)
                loss = losses.wgan_generator_loss(s_fake) + kl
                return loss, (gstats, cstats, kl)

            sub = {m: state.params[m] for m in ("con_augment", "generator")}
            (loss_g, (gen_stats, critic_stats, kl)), (sub_grads, tem_grad) = (
                jax.value_and_grad(gen_loss_hoisted, argnums=(0, 1), has_aux=True)(
                    sub, tem_full
                )
            )
            # the mismatched usages are stop-gradient (critic inputs), so
            # their cotangent is zero: a zero half-batch for the doubled
            # forward, or nothing at all for the reuse path
            if vjp_doubled:
                cot = jnp.concatenate(
                    [tem_grad, jnp.zeros_like(tem_grad)], axis=0
                )
            else:
                cot = tem_grad
            (ep_grads,) = text_vjp(cot.astype(tem_val.dtype))
            gen_grads = dict(sub_grads)
            gen_grads["encoder"] = ep_grads["encoder"]
            gen_grads["projection"] = ep_grads["projection"]
        else:

            def gen_loss_fn(gen_side_params):
                params = dict(state.params)
                params.update(gen_side_params)
                tem, _ = text_fwd_both(params, k_drop_l)
                fake, mu, sigma, gstats = self._gen_forward(
                    params, gen_stats, tem, k_ca_l, k_z_l, bsz
                )
                s_fake, cstats = self._critic_apply(
                    critic_params, critic_stats, fake, tem
                )
                kl = losses.kl_term(mu, sigma, c.kl_mode)
                loss = losses.wgan_generator_loss(s_fake) + kl
                return loss, (gstats, cstats, kl)

            gen_side = {m: state.params[m] for m in GEN_SIDE}
            (loss_g, (gen_stats, critic_stats, kl)), gen_grads = jax.value_and_grad(
                gen_loss_fn, has_aux=True
            )(gen_side)
        gen_grads = pmean(gen_grads)

        new_params = dict(state.params)
        new_opt = dict(state.opt_state)
        for m in GEN_SIDE:
            updates, new_opt[m] = self.tx[m].update(
                gen_grads[m], state.opt_state[m], state.params[m]
            )
            new_params[m] = optax.apply_updates(state.params[m], updates)
        new_params["critic"] = critic_params
        new_opt["critic"] = critic_opt

        metrics = {
            "loss_critic": d_losses[-1],
            "loss_gen": loss_g,
            "gp": gps[-1],
            "kl": kl,
        }
        metrics = pmean(metrics)

        new_state = Stage1State(
            params=new_params,
            batch_stats={"generator": gen_stats, "critic": critic_stats},
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, metrics


# ----------------------------------------------------------------------
def make_train_step(
    system: Stage1System, mesh: Mesh | None = None, donate: bool = True
):
    """Compile the train step; with a mesh, SPMD over the ``data`` axis.

    ``donate=True`` donates the input state's buffers (halves peak HBM for
    the params/opt-state); pass False when the caller must keep the old
    state alive (e.g. tests comparing before/after).
    """
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


def replicate_state(state, mesh: Mesh):
    """Place every leaf replicated over the mesh (the JAX analog of
    ``pjrt.broadcast_master_param``, reference train.py:78-85)."""
    return jax.device_put(state, NamedSharding(mesh, P()))


def shard_batch(batch, mesh: Mesh):
    """Shard the leading batch axis over the ``data`` mesh axis."""
    return jax.device_put(batch, NamedSharding(mesh, P("data")))


# ---------------------------------------------------------------------------
# 2-D (data x model) mesh: DP + Megatron tensor parallelism for the BERT
# encoder, via GSPMD. Goes beyond the reference (DP-only, SURVEY §2); the
# in-step fine-tuned BERT is the one transformer in the stage-1 step and
# the natural TP target when its activations/params outgrow one chip.


def state_tp_specs(state: Stage1State):
    """PartitionSpec pytree for a ``Stage1State`` on a ('data', 'model')
    mesh: Megatron column/row specs (parallel/tp.py rules) for the BERT
    encoder's attention/MLP kernels, replicated everything else. Applied
    by *path*, so Adam's mu/nu (which mirror the param tree, param names
    included) pick up the same specs as the params they track."""
    from imagegenerator_tpu.parallel.tp import _spec_for

    def spec(path, _leaf):
        names = tuple(p.key if hasattr(p, "key") else str(p) for p in path)
        if "encoder" in names:
            return _spec_for(names)
        return P()

    return jax.tree_util.tree_map_with_path(spec, state)


def shard_state_2d(state: Stage1State, mesh: Mesh) -> Stage1State:
    """Place a state on the 2-D mesh per ``state_tp_specs`` (the TP analog
    of ``replicate_state``)."""
    specs = state_tp_specs(state)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs
    )


def make_train_step_2d(system: Stage1System, mesh: Mesh, donate: bool = True):
    """GSPMD 2-D train step: batch sharded over ``data``, BERT params
    column/row-sharded over ``model`` (state placed by ``shard_state_2d``).
    The XLA partitioner inserts every collective — gradient all-reduce
    over ``data``, activation all-reduces over ``model`` after the
    attention-out / MLP-out row-parallel matmuls — from the shardings
    alone; the step body is the same pure ``train_step``.

    Numerics note: the shard_map DP path computes BatchNorm statistics
    per shard (reference-faithful, torch_xla per-core BN); under GSPMD
    the partitioner sees one logical batch reduction, so BN stats are
    global (sync-BN). Same contract, different (arguably better)
    estimator — tested at data=1 where the two coincide."""
    fn = functools.partial(system.train_step, axis_name=None)
    donate_argnums = (0,) if donate else ()
    with mesh:
        return jax.jit(
            fn,
            donate_argnums=donate_argnums,
            in_shardings=(None, NamedSharding(mesh, P("data")), None),
        )
