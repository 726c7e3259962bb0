from surel_plus_tpu.models.net import Net
from surel_plus_tpu.models.honet import HONet

__all__ = ["Net", "HONet"]
