"""StepLR-equivalent schedule behavior (reference train.py:105-113)."""

import numpy as np

from imagegenerator_tpu.train import schedules


def test_step_lr_decay_points():
    sched = schedules.step_lr(1e-3, step_size=100, gamma=0.5)
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(99)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(199)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(200)), 2.5e-4, rtol=1e-6)


def test_optimizers_construct():
    import jax.numpy as jnp

    params = {"w": jnp.ones((4, 4))}
    for tx in (schedules.adam_with_steplr(1e-3), schedules.adamw_with_steplr(5e-5)):
        state = tx.init(params)
        updates, _ = tx.update({"w": jnp.ones((4, 4))}, state, params)
        assert updates["w"].shape == (4, 4)
