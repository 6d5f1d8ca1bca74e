"""Epoch-loop trainers wiring data loader + train step + checkpointing +
metrics for both stages.

The role of ``/root/reference/train.py:60-164`` (build everything, run
``train_1``) and the epoch loops of ``stage_{1,2}_train_fn.py`` — but
with resume/checkpoint via Orbax, metrics via MetricsWriter, and all
noise/permutation randomness derived from one root key folded with the
global step (replacing the reference's seed all-reduce,
stage_1_train_fn.py:98-106).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh

from imagegenerator_tpu.checkpoint import CheckpointManager
from imagegenerator_tpu.train import ema as ema_lib
from imagegenerator_tpu.train import stage1 as s1
from imagegenerator_tpu.train import stage2 as s2
from imagegenerator_tpu.utils.metrics import MetricsWriter


@dataclasses.dataclass
class TrainerOptions:
    num_epochs: int = 500  # reference train.py:36
    save_every_epochs: int = 10  # reference stage_1_train_fn.py:211
    log_every_steps: int = 1
    sample_every_steps: int = 100  # stage-2 image grids (ref :181)
    seed: int = 42  # reference train.py:66
    # PRNG implementation for every in-step random stream (dropout,
    # mismatch permutation, CA/z noise). 'threefry2x32' (JAX default) is
    # kept for golden stability; 'rbg' is ~8% faster whole-step on v5e
    # once GELU is cheap (the threefry mask generation was the exposed
    # VPU cost — benchmarks/PROFILE_stage1_r03.md). Both are
    # deterministic per seed; the bitstreams differ.
    rng_impl: str | None = None
    checkpoint_dir: str | None = None
    logdir: str | None = None
    # EMA decay for the generator-side params (None = off). The EMA
    # tree lives outside the train state (train/ema.py): the jitted
    # step is untouched and checkpoints grow an {"aux": {"ema": ...}}
    # side tree (save_with_aux). Sample from it via
    # ``train.sample --ema``.
    ema_decay: float | None = None

    def make_key(self, seed: int) -> "jax.Array":
        if self.rng_impl:
            return jax.random.key(seed, impl=self.rng_impl)
        return jax.random.key(seed)


class _EmaSupport:
    """Shared EMA plumbing for both trainers: the average lives on the
    trainer (not in the jitted state), checkpoints via save_with_aux,
    and pre-EMA checkpoints upgrade by seeding the average from the
    restored params."""

    def _init_ema_support(self, stage: int):
        self.ema = None
        self._ema_modules = ema_lib.modules_for_stage(stage)
        self._ema_update = (
            ema_lib.make_ema_update(self.opt.ema_decay)
            if self.opt.ema_decay is not None
            else None
        )

    def _restore_latest(self, state):
        """(state, start_epoch), also seeding self.ema when enabled."""
        if self._ema_update is None:
            restored, start_epoch = self.ckpt.restore_latest(state)
            return restored, start_epoch
        restored, aux, start_epoch = self.ckpt.restore_latest_with_aux(
            state
        )
        if restored is not None:
            self.ema = (
                aux["ema"]
                if aux is not None
                else ema_lib.init_ema(restored.params, self._ema_modules)
            )
        return restored, start_epoch

    def _seed_ema(self, state):
        if self._ema_update is not None and self.ema is None:
            self.ema = ema_lib.init_ema(state.params, self._ema_modules)

    def _ema_step(self, state):
        if self._ema_update is not None:
            self.ema = self._ema_update(
                self.ema, ema_lib.tracked(state.params, self.ema)
            )

    def _save(self, epoch, state):
        if self._ema_update is None:
            self.ckpt.save(epoch, jax.device_get(state))
        else:
            self.ckpt.save_with_aux(
                epoch,
                jax.device_get(state),
                {"ema": jax.device_get(self.ema)},
            )


class Stage1Trainer(_EmaSupport):
    def __init__(
        self,
        system: s1.Stage1System,
        loader,
        options: TrainerOptions,
        mesh: Mesh | None = None,
    ):
        self.system = system
        self.loader = loader
        self.opt = options
        self.mesh = mesh
        # A mesh with a 'model' axis selects the GSPMD dp x tp step
        # (Megatron-sharded BERT, stage1.make_train_step_2d); a 1-D
        # 'data' mesh keeps the reference-faithful shard_map DP path.
        self.is_2d = mesh is not None and "model" in mesh.axis_names
        self.step_fn = (
            s1.make_train_step_2d(system, mesh)
            if self.is_2d
            else s1.make_train_step(system, mesh=mesh)
        )
        self.writer = MetricsWriter(options.logdir)
        self.ckpt = (
            CheckpointManager(options.checkpoint_dir, options.save_every_epochs)
            if options.checkpoint_dir
            else None
        )
        self._init_ema_support(stage=1)

    def init_state(self, batch_size: int):
        state = self.system.init(self.opt.make_key(self.opt.seed), batch_size)
        start_epoch = 0
        if self.ckpt is not None:
            restored, start_epoch = self._restore_latest(state)
            if restored is not None:
                state = restored
                print(f"Loaded checkpoint at epoch {start_epoch - 1}")
        self._seed_ema(state)
        if self.mesh is not None:
            state = (
                s1.shard_state_2d(state, self.mesh)
                if self.is_2d
                else s1.replicate_state(state, self.mesh)
            )
        return state, start_epoch

    def fit(self, state, start_epoch: int = 0):
        root_key = self.opt.make_key(self.opt.seed)
        gstep = int(state.step)
        for epoch in range(start_epoch, self.opt.num_epochs):
            for batch in self.loader:
                step_key = jax.random.fold_in(root_key, gstep)
                state, metrics = self.step_fn(state, batch, step_key)
                self._ema_step(state)
                if gstep % self.opt.log_every_steps == 0:
                    self.writer.scalars(
                        gstep,
                        {f"stage1/{k}": v for k, v in _host(metrics).items()},
                    )
                gstep += 1
            if self.ckpt is not None and self.ckpt.should_save(epoch):
                self._save(epoch, state)
        if self.ckpt is not None:
            self.ckpt.wait()  # publish the final marker (async saves)
        return state


class Stage2Trainer(_EmaSupport):
    def __init__(
        self,
        system: s2.Stage2System,
        loader,
        options: TrainerOptions,
        mesh: Mesh | None = None,
    ):
        self.system = system
        self.loader = loader
        self.opt = options
        self.mesh = mesh
        self.step_fn = s2.make_train_step(system, mesh=mesh)
        self.writer = MetricsWriter(options.logdir)
        self.ckpt = (
            CheckpointManager(options.checkpoint_dir, options.save_every_epochs)
            if options.checkpoint_dir
            else None
        )
        self._init_ema_support(stage=2)

    def init_state(self, batch_size: int, stage1_state=None):
        state = self.system.init(self.opt.make_key(self.opt.seed), batch_size)
        if stage1_state is not None:
            state = self.system.load_stage1(state, stage1_state)
        start_epoch = 0
        if self.ckpt is not None:
            restored, start_epoch = self._restore_latest(state)
            if restored is not None:
                state = restored
                print(f"Loaded checkpoint at epoch {start_epoch - 1}")
        self._seed_ema(state)
        if self.mesh is not None:
            state = s1.replicate_state(state, self.mesh)
        return state, start_epoch

    def fit(self, state, start_epoch: int = 0):
        root_key = self.opt.make_key(self.opt.seed)
        gstep = int(state.step)
        sample_key = self.opt.make_key(456)  # fixed-noise samples (ref :186)
        for epoch in range(start_epoch, self.opt.num_epochs):
            for batch in self.loader:
                step_key = jax.random.fold_in(root_key, gstep)
                state, metrics = self.step_fn(state, batch, step_key)
                self._ema_step(state)
                if gstep % self.opt.log_every_steps == 0:
                    self.writer.scalars(
                        gstep,
                        {f"stage2/{k}": v for k, v in _host(metrics).items()},
                    )
                if (
                    self.opt.sample_every_steps
                    and gstep % self.opt.sample_every_steps == 0
                    and gstep > 0
                ):
                    fake = self.system.sample(state, batch, sample_key)
                    self.writer.images(gstep, "fake_256", np.asarray(fake))
                    real_img = np.asarray(batch["image"])
                    if real_img.dtype == np.uint8:
                        # uint8 transfer path: normalize for display the
                        # same way the step does on-device
                        real_img = real_img.astype(np.float32) * (2 / 255) - 1
                    self.writer.images(gstep, "real_256", real_img)
                gstep += 1
            if self.ckpt is not None and self.ckpt.should_save(epoch):
                self._save(epoch, state)
        if self.ckpt is not None:
            self.ckpt.wait()  # publish the final marker (async saves)
        return state


def _host(metrics) -> dict:
    return {k: float(np.asarray(v)) for k, v in metrics.items()}
