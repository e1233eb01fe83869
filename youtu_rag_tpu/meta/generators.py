"""Meta generators: agents that generate agent configs and toolkits.

Parity with ``utu/meta`` (``SimpleAgentGenerator`` writing YAML configs,
``simple_agent_generator.py:30-237``; ``ToolGenerator(MCP)``,
``tool_generator_mcp.py:150``): an LLM drafts the artifact, the generator
validates it against the real loaders (AgentConfig validation / toolkit
import + schema generation) and retries with the error appended — the
debugger loop of ``tool_generator_mcp_debugger.py``."""

from __future__ import annotations

import re
from pathlib import Path

import yaml

from ..agents.config import AgentConfig
from ..utils.log import get_logger

logger = get_logger("meta.generators")

AGENT_GEN_PROMPT = """Design a simple agent config for this request.

Request: {requirement}

Available toolkits: {toolkits}

Reply YAML only (no fences) with keys: type (simple), agent (name,
instructions), toolkits (mapping of toolkit-name -> {{mode: builtin,
activated_tools: [...] or null}}), max_turns.
{error_context}"""

TOOL_GEN_PROMPT = """Write a Python toolkit class for this requirement.

Requirement: {requirement}

Rules:
- subclass AsyncBaseToolkit from youtu_rag_tpu.tools.base
- decorate async tool methods with @register_tool
- every tool method has a Google-style docstring with an Args: section
- return strings from tools
- no imports beyond the Python standard library and httpx

Reply with the Python source only (no fences).
{error_context}"""


class SimpleAgentGenerator:
    def __init__(self, llm_agent, max_retries: int = 2):
        self.llm = llm_agent
        self.max_retries = max_retries

    async def generate(self, requirement: str) -> AgentConfig:
        from ..tools import TOOLKIT_MAP
        from ..tools import builtin  # noqa: F401 - populate registry

        toolkits = ", ".join(sorted(TOOLKIT_MAP))
        error_context = ""
        last_err: Exception | None = None
        for _ in range(self.max_retries + 1):
            raw = await self.llm.run(
                AGENT_GEN_PROMPT.format(
                    requirement=requirement, toolkits=toolkits, error_context=error_context
                )
            )
            raw = re.sub(r"^```[a-z]*\n|\n```$", "", raw.strip())
            try:
                data = yaml.safe_load(raw)
                return AgentConfig.model_validate(data)
            except Exception as e:  # noqa: BLE001 - feed error back to LLM
                last_err = e
                error_context = f"Your previous output failed validation: {e}. Fix it."
        raise ValueError(f"agent generation failed: {last_err}")

    async def generate_to_file(self, requirement: str, path: str | Path) -> AgentConfig:
        cfg = await self.generate(requirement)
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(yaml.safe_dump(cfg.model_dump(), allow_unicode=True, sort_keys=False))
        logger.info("wrote agent config to %s", p)
        return cfg


class ToolGenerator:
    def __init__(self, llm_agent, max_retries: int = 2):
        self.llm = llm_agent
        self.max_retries = max_retries

    async def generate(self, requirement: str) -> tuple[str, type]:
        """Returns (source, toolkit_class); the class is import-validated
        and its schemas generated as the debug check."""
        error_context = ""
        last_err: Exception | None = None
        for _ in range(self.max_retries + 1):
            raw = await self.llm.run(
                TOOL_GEN_PROMPT.format(requirement=requirement, error_context=error_context)
            )
            source = re.sub(r"^```[a-z]*\n|\n```$", "", raw.strip())
            try:
                cls = self._validate(source)
                return source, cls
            except Exception as e:  # noqa: BLE001
                last_err = e
                error_context = f"Your previous code failed: {e}. Fix it."
        raise ValueError(f"tool generation failed: {last_err}")

    @staticmethod
    def _validate(source: str) -> type:
        from ..tools.base import AsyncBaseToolkit

        namespace: dict = {}
        exec(compile(source, "<generated_toolkit>", "exec"), namespace)  # noqa: S102
        classes = [
            v
            for v in namespace.values()
            if isinstance(v, type) and issubclass(v, AsyncBaseToolkit) and v is not AsyncBaseToolkit
        ]
        if not classes:
            raise ValueError("no AsyncBaseToolkit subclass defined")
        cls = classes[0]
        inst = cls()
        if not inst.tools_map:
            raise ValueError("toolkit defines no @register_tool methods")
        schemas = inst.get_tools_in_openai()
        for s in schemas:
            if not s["function"]["description"]:
                raise ValueError(f"tool {s['function']['name']} lacks a docstring summary")
        return cls

    async def generate_to_file(self, requirement: str, path: str | Path) -> type:
        source, cls = await self.generate(requirement)
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(source)
        logger.info("wrote toolkit to %s", p)
        return cls
