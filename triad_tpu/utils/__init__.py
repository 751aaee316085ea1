from triad_tpu.utils.logging import MetricsLogger
from triad_tpu.utils.profiling import StepTimer, profile_trace

__all__ = ["MetricsLogger", "StepTimer", "profile_trace"]
