from pikazoo_tpu.compat.parallel_env import env, raw_env

__all__ = ["env", "raw_env"]
