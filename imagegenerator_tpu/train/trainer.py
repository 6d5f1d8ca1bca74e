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

    def make_key(self, seed: int) -> "jax.Array":
        if self.rng_impl:
            return jax.random.key(seed, impl=self.rng_impl)
        return jax.random.key(seed)


class Stage1Trainer:
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

    def init_state(self, batch_size: int):
        state = self.system.init(self.opt.make_key(self.opt.seed), batch_size)
        start_epoch = 0
        if self.ckpt is not None:
            restored, start_epoch = self.ckpt.restore_latest(state)
            if restored is not None:
                state = restored
                print(f"Loaded checkpoint at epoch {start_epoch - 1}")
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
                if gstep % self.opt.log_every_steps == 0:
                    self.writer.scalars(
                        gstep,
                        {f"stage1/{k}": v for k, v in _host(metrics).items()},
                    )
                gstep += 1
            if self.ckpt is not None and self.ckpt.should_save(epoch):
                self.ckpt.save(epoch, jax.device_get(state))
        if self.ckpt is not None:
            self.ckpt.wait()  # publish the final marker (async saves)
        return state


class Stage2Trainer:
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

    def init_state(self, batch_size: int, stage1_state=None):
        state = self.system.init(self.opt.make_key(self.opt.seed), batch_size)
        if stage1_state is not None:
            state = self.system.load_stage1(state, stage1_state)
        start_epoch = 0
        if self.ckpt is not None:
            restored, start_epoch = self.ckpt.restore_latest(state)
            if restored is not None:
                state = restored
                print(f"Loaded checkpoint at epoch {start_epoch - 1}")
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
                self.ckpt.save(epoch, jax.device_get(state))
        if self.ckpt is not None:
            self.ckpt.wait()  # publish the final marker (async saves)
        return state


def _host(metrics) -> dict:
    return {k: float(np.asarray(v)) for k, v in metrics.items()}
