"""Agent factory (ref: utu/agents/__init__.py:10-26 get_agent)."""

from __future__ import annotations

from .config import AgentConfig
from .llm_agent import LLMAgent
from .simple_agent import SimpleAgent


def get_agent(config: AgentConfig | dict, **kwargs):
    if isinstance(config, dict):
        config = AgentConfig.from_dict(config)
    t = config.type
    if t == "simple":
        return SimpleAgent(config, **kwargs)
    if t == "llm":
        return LLMAgent(config, **kwargs)
    if t == "orchestra":
        from .orchestra import OrchestraAgent

        return OrchestraAgent(config, **kwargs)
    if t == "orchestrator":
        from .orchestrator import OrchestratorAgent

        return OrchestratorAgent(config, **kwargs)
    if t == "parallel_orchestrator":
        from .orchestrator import ParallelOrchestratorAgent

        return ParallelOrchestratorAgent(config, **kwargs)
    if t == "workforce":
        from .workforce import WorkforceAgent

        return WorkforceAgent(config, **kwargs)
    raise ValueError(f"unknown agent type {t!r}")
