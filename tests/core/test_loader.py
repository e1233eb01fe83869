import os

import pytest

from youtu_rag_tpu.core.loader import ConfigLoader


@pytest.fixture
def tree(tmp_path):
    (tmp_path / "agents" / "simple").mkdir(parents=True)
    (tmp_path / "rag").mkdir()
    (tmp_path / "agents" / "simple" / "base.yaml").write_text(
        "type: simple\nmax_turns: 50\nagent:\n  name: base\n  instructions: base instructions\n"
    )
    (tmp_path / "agents" / "derived.yaml").write_text(
        "defaults:\n  - simple/base\n  - _self_\nagent:\n  name: derived\nmax_turns: 10\n"
    )
    (tmp_path / "rag" / "default.yaml").write_text(
        "name: default\nretriever:\n  top_k: ${oc.env:YRT_TEST_TOPK,7}\n"
    )
    return ConfigLoader(tmp_path)


def test_compose_defaults(tree):
    cfg = tree.load_raw("derived", group="agents")
    assert cfg["max_turns"] == 10  # own key wins
    assert cfg["agent"]["name"] == "derived"
    assert cfg["agent"]["instructions"] == "base instructions"  # inherited


def test_env_interpolation(tree, monkeypatch):
    cfg = tree.load_raw("default", group="rag")
    assert cfg["retriever"]["top_k"] == 7  # default used
    monkeypatch.setenv("YRT_TEST_TOPK", "3")
    assert tree.load_raw("default", group="rag")["retriever"]["top_k"] == 3


def test_typed_agent_loading(tree):
    agent_cfg = tree.load_agent_config("derived")
    assert agent_cfg.max_turns == 10
    assert agent_cfg.agent.name == "derived"


def test_missing_config_raises(tree):
    with pytest.raises(FileNotFoundError):
        tree.load_raw("nope", group="agents")


def test_repo_configs_compose():
    """The shipped configs/ tree must validate end-to-end."""
    loader = ConfigLoader(os.path.join(os.path.dirname(__file__), "..", "..", "configs"))
    agent = loader.load_agent_config("kb_search")
    assert agent.type == "simple"
    assert "kb_search" in agent.toolkits
    assert agent.max_turns == 50  # from base
    rag = loader.load_rag_config("default")
    assert rag.retriever.recall_multiplier == 3
    assert rag.vector_store.index.block_rows == 1024


def test_example_configs_validate():
    """All shipped example configs must load into valid models."""
    loader = ConfigLoader(os.path.join(os.path.dirname(__file__), "..", "..", "configs"))
    orch = loader.load_agent_config("orchestra_example")
    assert orch.type == "orchestra"
    assert set(orch.workers) == {"searcher", "analyst"}
    assert orch.workers["analyst"].toolkits["python_executor"].mode == "builtin"
    wf = loader.load_agent_config("workforce_example")
    assert wf.type == "workforce"
    assert set(wf.workforce_executor_agents) == {"researcher", "coder"}
    ev = loader.load_eval_config("default")
    assert ev.processor == "exact_match"
