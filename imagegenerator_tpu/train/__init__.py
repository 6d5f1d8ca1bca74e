"""Training: losses, LR schedules, jitted stage-1/2 train steps, trainer."""

from imagegenerator_tpu.train import losses, schedules  # noqa: F401
