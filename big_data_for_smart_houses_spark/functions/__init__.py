from .numeric import guarded_div, clamp01, bround3
from .timeutil import parse_iso_ts, delta_hours_us

__all__ = ["guarded_div", "clamp01", "bround3", "parse_iso_ts", "delta_hours_us"]
