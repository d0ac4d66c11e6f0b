"""Registry-based instantiation (replaces import-string `target:` wiring).

The reference resolves classes from dotted import strings at runtime
(data/utils/utils.py:75-81,178-181). Here, constructible targets register
under stable names; reference-style dotted targets are aliased so the
reference's YAML files work unmodified.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Mapping

_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register(name: str, *aliases: str) -> Callable[[Callable], Callable]:
    def deco(fn: Callable) -> Callable:
        for key in (name, *aliases):
            if key in _REGISTRY and _REGISTRY[key] is not fn:
                raise KeyError(f"registry name collision: {key}")
            _REGISTRY[key] = fn
        return fn

    return deco


def get(name: str) -> Callable[..., Any]:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown target {name!r}; known: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def instantiate_from_config(cfg: Mapping, **extra: Any) -> Any:
    """Build the object described by a ``{target: ..., params: {...}}`` node
    (reference: data/utils/utils.py:178-181)."""
    if "target" not in cfg:
        raise KeyError("expected `target` key in config node")
    params = dict(cfg.get("params") or {})
    params.update(extra)
    return get(cfg["target"])(**params)


def known_targets() -> list[str]:
    return sorted(_REGISTRY)
