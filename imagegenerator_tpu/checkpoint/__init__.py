from imagegenerator_tpu.checkpoint.manager import CheckpointManager

__all__ = ["CheckpointManager"]
