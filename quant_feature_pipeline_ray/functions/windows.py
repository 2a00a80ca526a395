"""Window-spec parsing (M10 analogue).

The reference re-implements timeframe parsing in five places
(step2_resample.py:160-217, tools/time_index.py:4-27,
step5_featueres_unified.py:42-52, step4_merge_features.py:129-140,
tools/real_sliding_simple.py:19-27); here it lives once.
"""

from __future__ import annotations

import re

_UNITS = {"s": 1, "m": 60, "h": 3600, "d": 86400}
_RX = re.compile(r"^(\d+)\s*([smhd])$")


def parse_window(spec: str | int | float) -> int:
    """'5m' → 300, '2h' → 7200, '90s' → 90, 1800 → 1800 (seconds)."""
    if isinstance(spec, (int, float)):
        return int(spec)
    m = _RX.match(spec.strip().lower())
    if not m:
        raise ValueError(f"bad window spec {spec!r} (want e.g. '5m', '2h', '90s')")
    return int(m.group(1)) * _UNITS[m.group(2)]


def window_label(spec: str | int) -> str:
    s = parse_window(spec)
    for unit, mult in (("d", 86400), ("h", 3600), ("m", 60)):
        if s % mult == 0 and s >= mult:
            return f"{s // mult}{unit}"
    return f"{s}s"
