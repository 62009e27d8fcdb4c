from .config import config, configure, real_t, np_real_t, index_t
from .timing import StopWatch

__all__ = ["config", "configure", "real_t", "np_real_t", "index_t", "StopWatch"]
