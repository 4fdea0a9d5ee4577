from audioldm_tpu.utils.logging import MetricLogger
from audioldm_tpu.utils.profiling import trace_context

__all__ = ["MetricLogger", "trace_context"]
