"""LocalChatClient: the in-process TPU decoder behind the chat interface.

Plumbing-level tests with a tiny random decoder + byte-level vocab (real
quality comes from real checkpoints via load_pretrained_decoder — parity
in tests/models/test_decoder.py). Ref slot: the external LLM service the
reference requires (``utu/__init__.py:8``)."""

import asyncio

import jax.numpy as jnp
import pytest

from youtu_rag_tpu.agents.llm import ChatMessage, get_chat_client
from youtu_rag_tpu.agents.local_llm import LocalChatClient, render_chat
from youtu_rag_tpu.models.bpe import BPETokenizer, bytes_to_unicode
from youtu_rag_tpu.models.decoder import DecoderConfig, init_decoder_params


def _byte_tokenizer() -> BPETokenizer:
    """Merge-free byte-level vocab: every byte is one token (+ eos)."""
    vocab = {ch: i for i, ch in enumerate(bytes_to_unicode().values())}
    vocab["<|endoftext|>"] = 256
    return BPETokenizer(
        vocab, [], scheme="byte_level",
        added_tokens={"<|endoftext|>": 256}, eos_token="<|endoftext|>",
    )


@pytest.fixture(scope="module")
def client() -> LocalChatClient:
    cfg = DecoderConfig(
        vocab_size=320, d_model=32, n_layers=2, n_heads=4, n_kv_heads=2,
        d_ff=64, max_len=128, arch="llama", dtype=jnp.float32,
        eos_token_id=256,
    )
    params = init_decoder_params(cfg, seed=0)
    return LocalChatClient(
        params=params, cfg=cfg, tokenizer=_byte_tokenizer(),
        template="plain", max_new_tokens=16,
    )


def test_chat_returns_text_and_usage(client):
    resp = asyncio.run(client.chat([ChatMessage(role="user", content="hi")]))
    assert resp.message.role == "assistant"
    assert isinstance(resp.message.content, str)
    assert resp.usage.input_tokens > 0
    assert 0 <= resp.usage.output_tokens <= 16


def test_chat_deterministic_at_temperature_zero(client):
    msgs = [ChatMessage(role="user", content="same prompt")]
    r1 = asyncio.run(client.chat(msgs))
    r2 = asyncio.run(client.chat(msgs))
    assert r1.message.content == r2.message.content


def test_stream_chat_deltas_end_with_done(client):
    async def run():
        events = []
        async for d in client.stream_chat([ChatMessage(role="user", content="go")]):
            events.append(d)
        return events

    events = asyncio.run(run())
    assert events[-1].type == "done"
    text = "".join(e.text for e in events if e.type == "text_delta")
    assert text == (events[-1].response.message.content or "")


def test_tools_rejected_use_react_wrapper(client):
    with pytest.raises(ValueError, match="ReactChatClient"):
        asyncio.run(client.chat(
            [ChatMessage(role="user", content="x")],
            tools=[{"type": "function", "function": {"name": "f"}}],
        ))


def test_react_wrapper_composes(client):
    """Tool support via tools-as-text, the reference's ReactModel pattern."""
    from youtu_rag_tpu.agents.react import ReactChatClient

    wrapped = ReactChatClient(client)
    resp = asyncio.run(wrapped.chat(
        [ChatMessage(role="user", content="x")],
        tools=[{"type": "function",
                "function": {"name": "f", "description": "d", "parameters": {}}}],
    ))
    assert resp.message.role == "assistant"


def test_concurrent_chats_serialize(client):
    async def run():
        return await asyncio.gather(*[
            client.chat([ChatMessage(role="user", content=f"q{i}")])
            for i in range(4)
        ])

    out = asyncio.run(run())
    assert len(out) == 4 and all(r.message.role == "assistant" for r in out)


def test_get_chat_client_local_dispatch(client, tmp_path, monkeypatch):
    from youtu_rag_tpu.agents import local_llm

    built = {}

    def fake_init(self, weights_dir=None, **kw):
        built["dir"] = weights_dir
        built["kw"] = kw

    monkeypatch.setattr(local_llm.LocalChatClient, "__init__", fake_init)
    c = get_chat_client({"provider": "local", "weights_dir": str(tmp_path),
                         "max_tokens": 64})
    # local provider auto-wraps for tools-as-text (ReactModel slot)
    from youtu_rag_tpu.agents.react import ReactChatClient

    assert isinstance(c, ReactChatClient)
    assert isinstance(c.inner, local_llm.LocalChatClient)
    assert built["dir"] == str(tmp_path)
    assert built["kw"]["max_new_tokens"] == 64


def test_render_chat_templates():
    msgs = [ChatMessage(role="system", content="be brief"),
            ChatMessage(role="user", content="hello")]
    plain = render_chat(msgs, "plain")
    assert plain.endswith("assistant:") and "system: be brief" in plain
    chatml = render_chat(msgs, "chatml")
    assert chatml.endswith("<|im_start|>assistant\n")
    assert "<|im_start|>user\nhello<|im_end|>" in chatml
    llama = render_chat(msgs, "llama")
    assert "[INST]" in llama and "<<SYS>>" in llama and "hello" in llama


def test_stop_strings_cut_generation(client):
    client2 = LocalChatClient(
        params=client.params, cfg=client.cfg, tokenizer=client.tokenizer,
        template="plain", max_new_tokens=16, stop=["\nuser:"],
    )
    resp = asyncio.run(client2.chat([ChatMessage(role="user", content="hi")]))
    assert "\nuser:" not in (resp.message.content or "")


def test_max_new_tokens_clamped_to_context(client):
    # a request larger than the checkpoint's max_len must clamp, not raise
    # (found driving cli_chat --llm-weights-dir with a 128-ctx checkpoint)
    resp = asyncio.run(
        client.chat([ChatMessage(role="user", content="hi")], max_tokens=4096)
    )
    assert resp.usage.output_tokens <= client.cfg.max_len // 2
