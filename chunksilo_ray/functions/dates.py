"""Date parsing / filtering / recency boosting.

Behavioral re-implementations of the reference's date operators: tolerant
ISO-8601 parse (reference src/chunksilo/search.py:974-1007), strict
YYYY-MM-DD parse (search.py:1010-1015), inclusive date-range filtering
(search.py:1018-1050) and exponential recency boosting
score * (1 + w * exp(-ln2 * age_days / half_life)) (search.py:1053-1090).

Vectorized variants operate on numpy arrays for use inside map_batches.
"""

from __future__ import annotations

import datetime as _dt
import math
import re

import numpy as np

_ISO_RE = re.compile(r"^(\d{4})-(\d{2})-(\d{2})")


def parse_iso8601_to_date(s: str | None) -> str | None:
    """Tolerant ISO-8601 -> 'YYYY-MM-DD' (accepts trailing time/zone junk);
    None/invalid -> None."""
    if not s:
        return None
    m = _ISO_RE.match(s.strip())
    if not m:
        return None
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    try:
        _dt.date(y, mo, d)
    except ValueError:
        return None
    return f"{y:04d}-{mo:02d}-{d:02d}"


def parse_date(s: str) -> _dt.date:
    """Strict YYYY-MM-DD parse; raises ValueError on anything else."""
    return _dt.datetime.strptime(s, "%Y-%m-%d").date()


def date_in_range(date_str: str | None, date_from: str | None, date_to: str | None) -> bool:
    """Inclusive range check; rows without a parseable date are KEPT when no
    bound applies to them (reference keeps undated nodes, search.py:1030-1038)."""
    d = parse_iso8601_to_date(date_str) if date_str else None
    if d is None:
        return date_from is None and date_to is None
    if date_from is not None and d < date_from:
        return False
    if date_to is not None and d > date_to:
        return False
    return True


def recency_boost(score: float, age_days: float, half_life_days: float, weight: float) -> float:
    """score * (1 + weight * exp(-ln2 * age/half_life)) (search.py:1083-1085)."""
    if age_days < 0:
        age_days = 0.0
    return score * (1.0 + weight * math.exp(-math.log(2.0) * age_days / half_life_days))


def recency_boost_np(
    scores: np.ndarray, age_days: np.ndarray, half_life_days: float, weight: float
) -> np.ndarray:
    """Vectorized recency boost for map_batches bodies."""
    age = np.maximum(age_days, 0.0)
    return scores * (1.0 + weight * np.exp(-np.log(2.0) * age / half_life_days))
