"""OTLP JSON export + OpenInference mapping — no otel packages involved
(VERDICT r1 #7; ref: utu/tracing/otel_agents_processor.py:72-660)."""

import json

from youtu_rag_tpu.tracing.otlp import (
    GRAPH_NODE_ID,
    LLM_MODEL,
    LLM_TOKENS_COMPLETION,
    LLM_TOKENS_PROMPT,
    OTLPJsonExporter,
    OTLPProcessor,
    SPAN_KIND,
    TOOL_NAME,
    openinference_attributes,
    span_to_otlp,
)
from youtu_rag_tpu.tracing.tracer import get_tracer, setup_tracing


def _emit_spans():
    t = get_tracer()
    t.spans.clear()
    with t.trace("tr-test"):
        with t.span("agent", "kb_agent", input="what is hbm?") as s:
            s.attributes["output"] = "answer"
        with t.span("generation", "kb_agent", model="encoder-x") as s:
            s.attributes["input_tokens"] = 12
            s.attributes["output_tokens"] = 34
            s.attributes["input_messages"] = [{"role": "user", "content": "q"}]
            s.attributes["output"] = "a"
        with t.span("tool", "kb_embedding_search", arguments='{"query": "x"}') as s:
            s.attributes["output"] = "3 hits"
        with t.span("retrieval", "search", query="hbm bandwidth") as s:
            s.attributes["documents"] = [{"id": "c1", "score": 0.9}]
    return list(t.spans[-4:])


def test_openinference_mapping():
    agent, gen, tool, retr = _emit_spans()
    a = openinference_attributes(agent)
    assert a[SPAN_KIND] == "AGENT" and a[GRAPH_NODE_ID] == "kb_agent"
    g = openinference_attributes(gen)
    assert g[SPAN_KIND] == "LLM" and g[LLM_MODEL] == "encoder-x"
    assert g[LLM_TOKENS_PROMPT] == 12 and g[LLM_TOKENS_COMPLETION] == 34
    assert json.loads(g["input.value"]) == [{"role": "user", "content": "q"}]
    t = openinference_attributes(tool)
    assert t[SPAN_KIND] == "TOOL" and t[TOOL_NAME] == "kb_embedding_search"
    r = openinference_attributes(retr)
    assert r[SPAN_KIND] == "RETRIEVER" and "hbm" in r["input.value"]


def test_otlp_span_shape():
    spans = _emit_spans()
    o = span_to_otlp(spans[1])
    assert len(o["traceId"]) == 32 and len(o["spanId"]) == 16
    assert int(o["endTimeUnixNano"]) >= int(o["startTimeUnixNano"])
    keys = {a["key"] for a in o["attributes"]}
    assert SPAN_KIND in keys and LLM_MODEL in keys
    # protobuf-JSON int64 as string
    tok = next(a for a in o["attributes"] if a["key"] == LLM_TOKENS_PROMPT)
    assert tok["value"] == {"intValue": "12"}
    assert o["status"] == {"code": 1}
    # whole payload is valid JSON
    payload = OTLPJsonExporter("http://phx:6006").to_payload(spans)
    body = json.dumps(payload)
    rs = json.loads(body)["resourceSpans"][0]
    assert rs["resource"]["attributes"][0]["key"] == "openinference.project.name"
    assert len(rs["scopeSpans"][0]["spans"]) == 4


def test_error_span_status():
    t = get_tracer()
    try:
        with t.span("tool", "boom"):
            raise ValueError("kaput")
    except ValueError:
        pass
    o = span_to_otlp(t.spans[-1])
    assert o["status"] == {"code": 2, "message": "kaput"}


def test_processor_batches_and_degrades(monkeypatch):
    sent = []
    proc = OTLPProcessor("http://collector:4318", batch_size=2)
    monkeypatch.setattr(
        proc.exporter, "_post", lambda url, body: sent.append((url, json.loads(body))) or True
    )
    spans = _emit_spans()
    for s in spans[:3]:
        proc.on_span_end(s)
    assert len(sent) == 1  # one batch of 2, third buffered
    assert proc.flush()
    assert len(sent) == 2
    assert sent[0][0].endswith("/v1/traces")

    # unreachable collector degrades to a warning, never raises
    bad = OTLPProcessor("http://127.0.0.1:1", batch_size=1)
    bad.on_span_end(spans[0])  # must not raise
    assert bad.flush() in (True, False)


def test_setup_tracing_installs_otlp():
    t = setup_tracing(otlp_endpoint="http://phx:6006", console=False)
    assert any(type(p).__name__ == "OTLPProcessor" for p in t.processors)
    t.processors.clear()
