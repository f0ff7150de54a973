"""Drop-in import alias mirroring the reference's ``pikazoo.pikazoo_v0``.

Lets reference users switch with a one-line change:

    from pikazoo_tpu import pikazoo_v0
    env = pikazoo_v0.env(winning_score=15, serve="winner")
"""

from pikazoo_tpu.compat import env, raw_env

__all__ = ["env", "raw_env"]
