"""JSON config helpers (boost::ptree analog, /root/reference/include/json.h)."""

from __future__ import annotations


def get_child(params: dict, key: str) -> dict:
    """try_get_child: missing child -> empty dict (json.h:6-17)."""
    v = params.get(key)
    return v if isinstance(v, dict) else {}


def get_param(params: dict, key: str, default):
    v = params.get(key, default)
    if isinstance(default, bool) and isinstance(v, str):
        return v.lower() in ("1", "true", "yes")
    if default is not None and not isinstance(v, type(default)):
        try:
            return type(default)(v)
        except (TypeError, ValueError):
            return v
    return v
