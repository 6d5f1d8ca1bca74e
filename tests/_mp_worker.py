"""Worker for the 2-process jax.distributed test (test_multiprocess.py).

Run as: python tests/_mp_worker.py <pid> <nproc> <coordinator> <ckpt_dir>

Exercises, under a REAL 2-process / 4-device (2 per process) runtime:
* DataLoader._to_device's ``make_array_from_process_local_data`` branch
  (the multi-host batch-assembly path, data/pipeline.py) with a global
  cross-process reduction checked against the analytic value;
* CheckpointManager save/restore with the LATEST_EPOCH marker written by
  process 0 only, restore agreeing on every process.

(The reference's analog is the per-core xmp.spawn runtime +
DistributedSampler sharding + master-ordinal-only checkpointing,
/root/reference/train.py:64,167-169, stage_1_train_fn.py:211-238.)
"""

import sys

import numpy as np


def main() -> None:
    pid, nproc, coord, ckdir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc
    mesh = Mesh(np.array(jax.devices()), ("data",))

    # ---- multi-host DataLoader: local shards -> one global array ----
    from imagegenerator_tpu.data.pipeline import DataLoader

    class ToyDS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            # per-process content so the global sum proves both shards landed
            return f"cap {i}", np.full((2, 2, 3), 100.0 * pid + i, np.float32)

    class ToyTok:
        def __call__(self, captions):
            return {"n": np.arange(len(captions), dtype=np.int32)}

    loader = DataLoader(
        ToyDS(), ToyTok(), batch_size=2, shuffle=False, num_workers=2, mesh=mesh
    )
    batch = next(iter(loader))
    assert batch["image"].shape == (2 * nproc, 2, 2, 3), batch["image"].shape
    total = float(np.asarray(jax.jit(jnp.sum)(batch["image"])))
    # process p contributes items 0,1 of ToyDS(p): 12 * (100p + 0 + 100p + 1)
    expect = sum(12.0 * (100.0 * p * 2 + 1.0) for p in range(nproc))
    assert total == expect, (total, expect)

    # ---- multi-process checkpoint: marker by process 0, restore agrees ----
    from imagegenerator_tpu.checkpoint import CheckpointManager

    rep = NamedSharding(mesh, P())
    state = {
        "w": jax.device_put(jnp.arange(8.0).reshape(2, 4), rep),
        "step": jax.device_put(jnp.asarray(7), rep),
    }
    mgr = CheckpointManager(ckdir, save_every_epochs=10)
    mgr.save(0, state)
    mgr.wait()
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("marker_written")
    assert mgr.latest_epoch() == 0, mgr.latest_epoch()
    template = jax.tree.map(lambda x: jax.device_put(jnp.zeros_like(x), rep), state)
    restored, start_epoch = mgr.restore_latest(template)
    assert start_epoch == 1
    np.testing.assert_array_equal(
        np.asarray(restored["w"]), np.arange(8.0).reshape(2, 4)
    )
    assert int(np.asarray(restored["step"])) == 7

    print(f"WORKER_OK pid={pid} sum={total}", flush=True)


if __name__ == "__main__":
    main()
