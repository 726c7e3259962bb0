from surel_plus_tpu.utils.logger import ResultLogger, set_up_log
from surel_plus_tpu.utils.seeding import set_random_seed
from surel_plus_tpu.utils.checkpoint import save_checkpoint, load_checkpoint

__all__ = ["ResultLogger", "set_up_log", "set_random_seed",
           "save_checkpoint", "load_checkpoint"]
