"""Agent execution environments.

Parity with ``utu/env`` (``BaseEnv.get_state/get_tools/build/cleanup``,
``base_env.py:8-33``; ``BasicEnv``/``ShellLocalEnv``/``BrowserEnv`` and the
factory ``env/__init__.py:8-22``):

- ``BasicEnv``      — no extra tools/state;
- ``ShellLocalEnv`` — a workspace directory + bash/python/file toolkits;
- ``BrowserEnv``    — docker-backed browser sandbox; gated on a docker
  daemon (``docker_manager.py`` lifecycle) — absent here, constructing it
  raises with a clear message unless docker is reachable."""

from __future__ import annotations

import shutil
import tempfile

from ..tools.base import AsyncBaseToolkit
from ..utils.log import get_logger

logger = get_logger("agents.env")


class BaseEnv:
    async def build(self) -> None:
        ...

    async def cleanup(self) -> None:
        ...

    def get_state(self) -> str:
        return ""

    def get_tools(self) -> list[AsyncBaseToolkit]:
        return []


class BasicEnv(BaseEnv):
    pass


class ShellLocalEnv(BaseEnv):
    """Local workspace with shell/python/file tools."""

    def __init__(self, workspace: str | None = None, keep: bool = False):
        self.workspace = workspace or tempfile.mkdtemp(prefix="yrt-env-")
        self.keep = keep or workspace is not None
        self._toolkits: list[AsyncBaseToolkit] = []

    async def build(self) -> None:
        from ..tools.builtin import BashToolkit, FileToolkit, PythonExecutorToolkit

        cfg = {"workspace": self.workspace}
        self._toolkits = [
            BashToolkit({"workspace": self.workspace}),
            PythonExecutorToolkit(cfg),
            FileToolkit(cfg),
        ]

    async def cleanup(self) -> None:
        if not self.keep:
            shutil.rmtree(self.workspace, ignore_errors=True)

    def get_state(self) -> str:
        return f"workspace: {self.workspace}"

    def get_tools(self) -> list[AsyncBaseToolkit]:
        return self._toolkits


class BrowserEnv(BaseEnv):
    """Docker browser sandbox (gated; ref: env/utils/docker_manager.py)."""

    def __init__(self, image: str = "browser-sandbox", **kwargs):
        self.image = image
        self.kwargs = kwargs

    async def build(self) -> None:
        if shutil.which("docker") is None:
            raise RuntimeError(
                "BrowserEnv requires a docker daemon (none in this environment); "
                "use ShellLocalEnv or point YRT_DOCKER_HOST at a daemon"
            )
        raise NotImplementedError("docker browser sandbox lands with a docker-enabled image")


def get_env(config=None) -> BaseEnv:
    """Factory (ref: env/__init__.py get_env)."""
    name = getattr(config, "name", None) if config is not None else None
    cfg = dict(getattr(config, "config", {}) or {})
    if not name or name == "basic":
        return BasicEnv()
    if name in ("shell_local", "shell"):
        return ShellLocalEnv(**cfg)
    if name == "browser":
        return BrowserEnv(**cfg)
    raise ValueError(f"unknown env {name!r}")
