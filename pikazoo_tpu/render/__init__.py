from pikazoo_tpu.render.renderer import Renderer

__all__ = ["Renderer"]
