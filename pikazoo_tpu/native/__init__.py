from pikazoo_tpu.native.engine import (FIELDS, NFIELDS, NativeEngine,
                                       SingleStepper, native_available)

__all__ = ["NativeEngine", "SingleStepper", "FIELDS", "NFIELDS",
           "native_available"]
