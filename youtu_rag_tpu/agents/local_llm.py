"""Local TPU chat client: the decoder runtime behind the chat interface.

Completes the provider matrix of ``agents/llm.py``: the reference REQUIRES
an external OpenAI-compatible LLM service (env contract asserted at
``utu/__init__.py:8``); here ``provider: local`` serves a causal-LM
checkpoint (models/decoder.py) in-process on the TPU — same ``chat`` /
``stream_chat`` surface, no network. Tool calling composes through
``ReactChatClient`` (tools-as-text), exactly how the reference adapts
models without native function calling (``utu/models/react.py:34``).

Batching/caching behavior:
- prompts left-pad into pow2 length buckets (bounded jit cache);
- ``max_new_tokens`` rounds up to a pow2 bucket too — one compile per
  (prompt_bucket, gen_bucket, sampling-config) triple;
- generation runs as ONE jitted while_loop on device (no per-token RPC —
  through the axon tunnel a per-token dispatch would pay ~27 ms/token);
- an ``asyncio.Lock`` serializes device access across concurrent chats
  (single-chip serving; the dp-sharded serving path batches instead).

Chat templates: "plain" (role-tagged lines — the format the in-repo
trainer uses), "chatml" (<|im_start|> qwen-style), "llama" ([INST]-style).
Auto-detected from tokenizer special tokens when not forced.
"""

from __future__ import annotations

import asyncio
from pathlib import Path
from typing import Any

from ..utils.log import get_logger
from .llm import BaseChatClient, ChatMessage, ChatResponse, StreamDelta, Usage

logger = get_logger("agents.local_llm")


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b <<= 1
    return b


def render_chat(messages: list[ChatMessage], template: str) -> str:
    """Messages → a single prompt string ending with the assistant cue."""
    if template == "chatml":
        parts = [
            f"<|im_start|>{m.role}\n{m.content or ''}<|im_end|>" for m in messages
        ]
        return "\n".join(parts) + "\n<|im_start|>assistant\n"
    if template == "llama":
        sys = "\n".join(m.content or "" for m in messages if m.role == "system")
        out = ""
        for m in messages:
            if m.role == "user":
                body = (f"<<SYS>>\n{sys}\n<</SYS>>\n\n{m.content}" if sys else m.content) or ""
                sys = ""  # system folds into the first user turn only
                out += f"[INST] {body} [/INST]"
            elif m.role == "assistant":
                out += f" {m.content or ''} "
        return out
    # "plain": role-tagged lines; deterministic and trainer-friendly
    lines = [f"{m.role}: {m.content or ''}" for m in messages]
    return "\n".join(lines) + "\nassistant:"


class LocalChatClient(BaseChatClient):
    """Serve a causal-LM checkpoint through the chat-client interface."""

    def __init__(
        self,
        weights_dir: str | Path | None = None,
        *,
        params: Any = None,
        cfg: Any = None,
        tokenizer: Any = None,
        template: str | None = None,
        max_new_tokens: int = 256,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 1.0,
        stop: list[str] | None = None,
        seed: int = 0,
    ):
        if weights_dir is not None:
            from ..models.bpe import BPETokenizer
            from ..models.pretrained import load_pretrained_decoder

            params, cfg = load_pretrained_decoder(weights_dir)
            tokenizer = BPETokenizer.from_dir(weights_dir)
        if params is None or cfg is None or tokenizer is None:
            raise ValueError(
                "LocalChatClient needs weights_dir or (params, cfg, tokenizer)"
            )
        import jax

        from ..models.decoder import cast_params_for_serving

        # decode reads every weight byte per token (HBM-bound): serve the
        # matmul weights in bf16 — 2x fewer bytes, measured 2x ms/token
        self.params = jax.device_put(cast_params_for_serving(params))
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.max_new_tokens = max_new_tokens
        self.temperature = temperature
        self.top_k = top_k
        self.top_p = top_p
        self.stop = list(stop or [])
        self.template = template or self._detect_template()
        self._lock = asyncio.Lock()
        self._key = jax.random.PRNGKey(seed)
        self.model = "local"

    def _detect_template(self) -> str:
        added = getattr(self.tokenizer, "added", {}) or {}
        if "<|im_start|>" in added:
            return "chatml"
        if getattr(self.tokenizer, "bos_token", None) == "<s>":
            return "llama"
        return "plain"

    # ------------------------------------------------------------- generate

    def _generate_sync(self, prompt_text: str, max_new: int, temperature: float) -> tuple[str, int, int]:
        import jax
        import numpy as np

        from ..models.decoder import generate, left_pad_batch

        ids = self.tokenizer.encode(prompt_text, add_bos=True)
        budget = self.cfg.max_len - max_new
        if budget <= 0:
            raise ValueError(
                f"max_new_tokens {max_new} leaves no prompt room at "
                f"max_len {self.cfg.max_len}"
            )
        if len(ids) > budget:
            ids = ids[-budget:]  # keep the most recent context
        toks, mask = left_pad_batch([ids], pad_id=self.cfg.eos_token_id)
        self._key, sub = jax.random.split(self._key)
        out, lengths = generate(
            self.params,
            toks,
            mask,
            sub,
            cfg=self.cfg,
            max_new_tokens=max_new,
            temperature=temperature,
            top_k=self.top_k,
            top_p=self.top_p,
        )
        n = int(np.asarray(lengths)[0])
        text = self.tokenizer.decode(list(np.asarray(out)[0, :n]))
        for s in self.stop:  # template end-markers count as stop strings
            cut = text.find(s)
            if cut >= 0:
                text = text[:cut]
        return text.strip(), len(ids), n

    async def chat(self, messages, tools=None, **kwargs) -> ChatResponse:
        if tools:
            raise ValueError(
                "LocalChatClient is text-only — wrap it in ReactChatClient "
                "for tool calling (agents/react.py)"
            )
        prompt = render_chat(messages, self.template)
        max_new = _bucket(int(kwargs.get("max_tokens") or self.max_new_tokens))
        # clamp to the checkpoint's context: leave at least half of max_len
        # for the prompt (tiny models ship max_len < the 256-token default)
        while max_new > max(1, self.cfg.max_len // 2):
            max_new >>= 1
        temperature = float(
            self.temperature if kwargs.get("temperature") is None else kwargs["temperature"]
        )
        async with self._lock:
            text, n_in, n_out = await asyncio.to_thread(
                self._generate_sync, prompt, max_new, temperature
            )
        usage = Usage(input_tokens=n_in, output_tokens=n_out)
        return ChatResponse(ChatMessage(role="assistant", content=text), usage=usage)

    async def stream_chat(self, messages, tools=None, **kwargs):
        """One device-side generate, re-emitted as word-chunk deltas.

        Per-token host round-trips would pay the full dispatch RPC per
        token; a single while_loop launch is the TPU-honest shape."""
        resp = await self.chat(messages, tools, **kwargs)
        text = resp.message.content or ""
        step = 48
        for i in range(0, len(text), step):
            yield StreamDelta("text_delta", text=text[i : i + step])
        yield StreamDelta("done", response=resp)
