from sdflabel_tpu.renderer.rasterer import Rasterer, render  # noqa: F401
