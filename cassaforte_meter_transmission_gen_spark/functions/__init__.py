from .energy import SAMPLE_RATE, SAW_PERIOD, joules_over_second  # noqa: F401
from .timeutil import hhmmss, trunc_to_day, trunc_to_hour, trunc_to_min  # noqa: F401
from .hashing import host_hash  # noqa: F401
