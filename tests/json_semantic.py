"""Semantic JSON equality for STAC round-trip tests — our own
implementation of the comparator contract described in SURVEY.md §5
(numeric tolerance, null == missing key, RFC3339 strings equal when the
parsed datetimes are equal, NaN == NaN)."""

from __future__ import annotations

import math
import re
from datetime import datetime

_DT_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:?\d{2})?$"
)


def _parse_dt(s: str) -> datetime | None:
    if not _DT_RE.match(s):
        return None
    s2 = s.replace("Z", "+00:00").replace(" ", "T")
    try:
        return datetime.fromisoformat(s2)
    except ValueError:
        return None


def json_equal(a, b, rel_tol: float = 0.0, path: str = "$") -> tuple[bool, str]:
    """Return (equal, first_difference_description)."""
    if a is None and b is None:
        return True, ""
    if isinstance(a, dict) or isinstance(b, dict):
        a = a if isinstance(a, dict) else {}
        b = b if isinstance(b, dict) else ({} if b is None else b)
        if not isinstance(b, dict):
            return False, f"{path}: dict vs {type(b).__name__}"
        keys = set(a) | set(b)
        for k in sorted(keys):
            va, vb = a.get(k), b.get(k)
            if va is None and vb is None:
                continue  # null == missing
            if va is None or vb is None:
                if isinstance(va, (dict, list)) or isinstance(vb, (dict, list)):
                    # empty containers == missing too
                    non_null = va if vb is None else vb
                    if non_null == {} or non_null == []:
                        continue
                return False, f"{path}.{k}: {va!r} vs {vb!r}"
            ok, why = json_equal(va, vb, rel_tol, f"{path}.{k}")
            if not ok:
                return False, why
        return True, ""
    if isinstance(a, list) and isinstance(b, list):
        if len(a) != len(b):
            return False, f"{path}: list length {len(a)} vs {len(b)}"
        for i, (va, vb) in enumerate(zip(a, b)):
            ok, why = json_equal(va, vb, rel_tol, f"{path}[{i}]")
            if not ok:
                return False, why
        return True, ""
    if isinstance(a, bool) or isinstance(b, bool):
        return (a is b), f"{path}: {a!r} vs {b!r}"
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True, ""
        if math.isclose(fa, fb, rel_tol=rel_tol, abs_tol=rel_tol):
            return True, ""
        return False, f"{path}: {a!r} vs {b!r}"
    if isinstance(a, str) and isinstance(b, str):
        if a == b:
            return True, ""
        da, db = _parse_dt(a), _parse_dt(b)
        if da is not None and db is not None and da == db:
            return True, ""
        return False, f"{path}: {a!r} vs {b!r}"
    return (a == b), f"{path}: {a!r} vs {b!r}"


def items_equal(expected: list[dict], actual: list[dict], rel_tol: float = 0.0):
    """Compare item lists by id (order-insensitive)."""
    if len(expected) != len(actual):
        return False, f"count {len(expected)} vs {len(actual)}"
    ex = {it["id"]: it for it in expected}
    ac = {it["id"]: it for it in actual}
    if set(ex) != set(ac):
        return False, f"id sets differ: {sorted(set(ex) ^ set(ac))}"
    for k in ex:
        ok, why = json_equal(ex[k], ac[k], rel_tol, path=f"item[{k}]")
        if not ok:
            return False, why
    return True, ""
