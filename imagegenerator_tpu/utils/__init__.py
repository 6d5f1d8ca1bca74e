from imagegenerator_tpu.utils.metrics import MetricsWriter
from imagegenerator_tpu.utils.profiling import step_timer, trace

__all__ = ["MetricsWriter", "step_timer", "trace"]
