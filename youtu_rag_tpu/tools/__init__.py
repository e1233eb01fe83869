from .base import AsyncBaseToolkit, register_tool, ToolkitConfig
from .schema import function_schema

TOOLKIT_MAP: dict[str, type] = {}


def register_toolkit(name: str):
    """Class decorator adding a toolkit to the registry
    (ref: TOOLKIT_MAP in utu/tools/__init__.py:25-46)."""

    def deco(cls):
        TOOLKIT_MAP[name] = cls
        return cls

    return deco


def get_toolkit(name: str, config=None):
    # populate registry lazily to avoid import cycles
    from . import builtin  # noqa: F401

    if name not in TOOLKIT_MAP:
        raise KeyError(f"unknown toolkit {name!r}; available: {sorted(TOOLKIT_MAP)}")
    return TOOLKIT_MAP[name](config)


__all__ = [
    "AsyncBaseToolkit",
    "TOOLKIT_MAP",
    "ToolkitConfig",
    "function_schema",
    "get_toolkit",
    "register_tool",
    "register_toolkit",
]
