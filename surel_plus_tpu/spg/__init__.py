from surel_plus_tpu.spg.spg import SpG

__all__ = ["SpG"]
