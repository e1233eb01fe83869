"""Every YAML shipped under configs/ must load through its typed loader
(the reference equivalent is tests/test_config.py exercising Hydra
composition across the configs tree)."""

from pathlib import Path

import pytest

from youtu_rag_tpu.core.loader import ConfigLoader

ROOT = Path(__file__).resolve().parents[2] / "configs"
LOADER = ConfigLoader(ROOT)


def _group_files(group: str) -> list[str]:
    base = ROOT / group
    return sorted(
        str(p.relative_to(base)) for p in base.rglob("*.yaml") if p.is_file()
    )


# base.yaml under agents/simple is a fragment (no type), but it still
# validates as a simple agent; model/base.yaml is a pure fragment and is
# loaded raw below.
@pytest.mark.parametrize("name", _group_files("agents"))
def test_agent_configs_load(name):
    cfg = LOADER.load_agent_config(name)
    assert cfg.type in (
        "simple", "llm", "orchestra", "orchestra_react_sql", "orchestrator",
        "parallel_orchestrator", "workforce", "excel",
    )


@pytest.mark.parametrize("name", _group_files("tools"))
def test_toolkit_configs_load(name):
    cfg = LOADER.load_toolkit_config(name)
    assert cfg.name
    assert cfg.mode in ("builtin", "mcp")


@pytest.mark.parametrize("name", _group_files("rag"))
def test_rag_configs_load(name):
    cfg = LOADER.load_rag_config(name)
    assert cfg.vector_store.index.kind in ("flat", "ivf")


@pytest.mark.parametrize("name", _group_files("eval"))
def test_eval_configs_load(name):
    cfg = LOADER.load_eval_config(name)
    assert cfg.processor in ("exact_match", "llm_judge", "gaia", "webwalker", "xbench", "browsecomp")


def test_model_fragment_loads_raw():
    raw = LOADER.load_raw("base", group="model")
    assert "model" in raw


def test_composition_overrides_win():
    # ivf_int8 composes rag/default and must override the index kind
    cfg = LOADER.load_rag_config("ivf_int8")
    assert cfg.vector_store.index.kind == "ivf"
    assert cfg.vector_store.index.storage_dtype == "int8"
    # while inheriting untouched defaults
    assert cfg.knowledge_builder.chunking.chunk_size == 1000


def test_agent_composition_inherits_model_block(monkeypatch):
    monkeypatch.setenv("YRT_LLM_MODEL", "test-model")
    cfg = LOADER.load_agent_config("search")
    assert cfg.model.model == "test-model"
    assert cfg.agent.name == "searcher"
