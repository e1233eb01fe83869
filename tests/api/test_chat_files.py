"""Chat file_ids injection + Excel-agent routing
(ref: ChatService.modify_query, chat_service.py:486-623)."""

import json
import tempfile

from tornado.testing import AsyncHTTPTestCase

from youtu_rag_tpu.agents.config import AgentConfig
from youtu_rag_tpu.agents.llm import FakeChatClient
from youtu_rag_tpu.agents.simple_agent import SimpleAgent
from youtu_rag_tpu.api.app import create_app
from youtu_rag_tpu.api.state import ApiState
from youtu_rag_tpu.core.config import IndexConfig, RAGConfig, VectorStoreConfig
from youtu_rag_tpu.integrations.dtr.excel_agent import ExcelAgent


def _state():
    rag = RAGConfig(vector_store=VectorStoreConfig(index=IndexConfig(min_capacity=256, block_rows=128)))
    return ApiState(data_dir=tempfile.mkdtemp(prefix="yrt-chatf-"), rag_config=rag)


class ChatFileTest(AsyncHTTPTestCase):
    def get_app(self):
        self.state = _state()
        self.seen = {}

        def rule(messages, tools):
            self.seen["prompt"] = messages[-1].content
            return FakeChatClient.text_response("noted")

        self.state.agent = SimpleAgent(AgentConfig(), client=FakeChatClient(rule_fn=rule))
        return create_app(self.state)

    def test_text_file_inlined_into_query(self):
        self.state.files.upload("uploads", "notes.md", b"HBM runs at 820 GB/s")
        r = self.fetch("/api/chat", method="POST", body=json.dumps(
            {"query": "summarize the attachment", "file_ids": ["notes.md"], "stream": False}))
        assert r.code == 200
        assert "820 GB/s" in self.seen["prompt"]          # content inlined
        assert "[attached file:" in self.seen["prompt"]   # path visible to file tools

    def test_missing_file_400(self):
        r = self.fetch("/api/chat", method="POST", body=json.dumps(
            {"query": "q", "file_ids": ["nope.md"], "stream": False}))
        assert r.code == 400


class ChatExcelRouteTest(AsyncHTTPTestCase):
    def get_app(self):
        self.state = _state()

        def rule(messages, tools):
            content = messages[-1].content or ""
            if content.startswith("You are a data analyst planning"):
                return FakeChatClient.text_response('["total the amount column"]')
            if content.startswith("Write pandas code"):
                return FakeChatClient.text_response(
                    "print(dfs['Sheet1']['amount'].sum())")
            if content.startswith("Did this step execution succeed"):
                return FakeChatClient.text_response('{"success": true, "reason": ""}')
            if content.startswith("Answer the question"):
                return FakeChatClient.text_response("The total amount is 60.")
            return FakeChatClient.text_response("?")

        self.state.agent = ExcelAgent(client=FakeChatClient(rule_fn=rule))
        return create_app(self.state)

    def test_spreadsheet_routes_to_excel_agent(self):
        self.state.files.upload("uploads", "sales.csv", b"amount\n10\n20\n30\n")
        r = self.fetch("/api/chat", method="POST", body=json.dumps(
            {"query": "total amount?", "file_ids": ["sales.csv"], "stream": False}),
            request_timeout=60)
        assert r.code == 200
        assert "60" in json.loads(r.body)["answer"]


def test_factory_builds_excel_agent():
    from youtu_rag_tpu.agents.factory import get_agent

    agent = get_agent({"type": "excel"}, client=FakeChatClient(), trajectory_sink=None)
    assert isinstance(agent, ExcelAgent)
