"""API state registry lifecycle: KBs built via the API must be visible
to agent KB toolkits (GLOBAL_KB_REGISTRY) and fully unregistered on
delete (registry + global + monitor)."""

import tempfile

from youtu_rag_tpu.api.state import ApiState
from youtu_rag_tpu.retrieval.kb import GLOBAL_KB_REGISTRY


def test_api_kbs_reach_global_registry_and_unregister():
    with tempfile.TemporaryDirectory() as d:
        state = ApiState(data_dir=d)
        name = "reg-lifecycle-test-kb"
        try:
            state.get_or_create_kb(name)
            # agent toolkits resolve through the GLOBAL registry — an
            # API-built KB must be visible there or chat-over-KB fails
            assert GLOBAL_KB_REGISTRY.get(name) is not None
            assert name in state.monitor.monitors

            assert state.remove_kb(name) is True
            assert GLOBAL_KB_REGISTRY.get(name) is None
            assert name not in state.monitor.monitors  # no stale backend row
            assert state.kbs.get(name) is None
        finally:
            GLOBAL_KB_REGISTRY.remove(name)
