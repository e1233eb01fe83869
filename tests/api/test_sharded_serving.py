"""Multi-chip serving: an ApiState constructed with a device mesh shards
every KB it creates (ShardedVectorIndex) and the full HTTP surface —
build, query, snapshot — runs over the sharded engine. Hermetic on the
8-virtual-device CPU mesh the conftest forces."""

import json
import tempfile

from tornado.testing import AsyncHTTPTestCase

from youtu_rag_tpu.agents.config import AgentConfig
from youtu_rag_tpu.agents.llm import FakeChatClient
from youtu_rag_tpu.agents.simple_agent import SimpleAgent
from youtu_rag_tpu.api.app import create_app
from youtu_rag_tpu.api.state import ApiState
from youtu_rag_tpu.core.config import IndexConfig, RAGConfig, VectorStoreConfig


class ShardedServingTest(AsyncHTTPTestCase):
    def get_app(self):
        from youtu_rag_tpu.parallel.mesh import get_mesh

        rag = RAGConfig(
            vector_store=VectorStoreConfig(index=IndexConfig(min_capacity=256, block_rows=64))
        )
        self.state = ApiState(
            data_dir=tempfile.mkdtemp(prefix="yrt-shard-"),
            rag_config=rag,
            mesh=get_mesh({"db": 8}),
        )
        self.state.agent = SimpleAgent(
            AgentConfig(),
            client=FakeChatClient(rule_fn=lambda m, t: FakeChatClient.text_response("a")),
        )
        return create_app(self.state)

    def _json(self, resp):
        return json.loads(resp.body)

    def test_build_and_query_over_sharded_index(self):
        docs = [
            {"id": f"d{i}", "content": f"document number {i} about topic {i % 4}"}
            for i in range(24)
        ]
        r = self._json(
            self.fetch(
                "/api/knowledge-bases/shards/build",
                method="POST",
                body=json.dumps({"documents": docs}),
            )
        )
        assert r["status"]["status"] == "completed"
        assert r["status"]["total_chunks"] >= 24

        # the store really is sharded over the mesh
        from youtu_rag_tpu.parallel.sharded_index import ShardedVectorIndex

        kb = self.state.kbs.get("shards")
        assert isinstance(kb.store._index, ShardedVectorIndex)

        q = self._json(
            self.fetch(
                "/api/knowledge-bases/shards/query",
                method="POST",
                body=json.dumps({"query": "document number 7", "top_k": 3}),
            )
        )
        assert q["results"] and q["results"][0]["document_id"] == "d7"

        # hybrid mode fuses the corpus BM25 index with the sharded dense
        # engine (exact-term recall rides the host-side postings)
        qh = self._json(
            self.fetch(
                "/api/knowledge-bases/shards/query",
                method="POST",
                body=json.dumps({"query": "document number 7", "mode": "hybrid", "top_k": 3}),
            )
        )
        assert qh["results"] and qh["results"][0]["document_id"] == "d7"

        # chunk browsing + monitoring surfaces work over the sharded engine
        c = self._json(self.fetch("/api/knowledge-bases/shards/chunks?limit=5"))
        assert c["total"] >= 24 and len(c["chunks"]) == 5
        h = self.fetch("/api/monitor/health")
        assert h.code == 200
