from pikazoo_tpu.native.engine import (FIELDS, NFIELDS, NativeEngine,
                                       native_available)

__all__ = ["NativeEngine", "FIELDS", "NFIELDS", "native_available"]
