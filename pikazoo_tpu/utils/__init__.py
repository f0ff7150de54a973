from pikazoo_tpu.utils.profiling import Throughput, trace_annotation, profile_trace
from pikazoo_tpu.utils.logging import MetricsLogger
from pikazoo_tpu.utils.validation import validate_state

__all__ = ["Throughput", "trace_annotation", "profile_trace", "MetricsLogger",
           "validate_state"]
