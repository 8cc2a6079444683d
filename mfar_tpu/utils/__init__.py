from mfar_tpu.utils.jsonutil import remove_irregularities
from mfar_tpu.utils.timing import Timer, timed

__all__ = ["remove_irregularities", "Timer", "timed"]
