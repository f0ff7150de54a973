from pikazoo_tpu.parity.harness import (ReferenceTrace, SpyGenerator,
                                        record_reference_trace,
                                        reference_available)

__all__ = [
    "ReferenceTrace",
    "SpyGenerator",
    "record_reference_trace",
    "reference_available",
]
