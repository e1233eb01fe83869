"""Pretrained-weight import: HF safetensors → stacked encoder param tree.

Fills the quality slot of the reference's production embedding/rerank
services (``utu/rag/embeddings/service_embedder.py:16-177``,
``utu/rag/rerankers/openai_reranker.py:20-214``): instead of POSTing to a
remote model server, a BERT-family checkpoint (bge / gte / e5 / multilingual
miniLM layouts — any ``BertModel``-shaped safetensors) loads directly into
the TPU encoder's scan-stacked param tree and runs in-process under jit.

Supported layout (HF ``BertModel``, optionally wrapped in a
``BertForSequenceClassification`` reranker):
  embeddings.{word,position,token_type}_embeddings.weight, embeddings.LayerNorm.*
  encoder.layer.N.attention.self.{query,key,value}.{weight,bias}
  encoder.layer.N.attention.output.dense.* + LayerNorm.*
  encoder.layer.N.intermediate.dense.* / output.dense.* + LayerNorm.*
  [pooler.dense.*]  [classifier.*]
Optional prefixes ``bert.`` / ``model.`` are stripped. HF ``nn.Linear``
stores [out, in]; weights transpose to the einsum [in, out] layout here.
Per-layer tensors stack on a leading L axis (the ``lax.scan`` axis).

Parity: tests/models/test_pretrained.py saves a random
``transformers.BertModel`` and asserts the JAX forward matches the torch
forward to 1e-4 in f32.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np

from ..utils.log import get_logger
from .wordpiece import WordPieceTokenizer

logger = get_logger("models.pretrained")


def load_safetensors(path) -> dict[str, np.ndarray]:
    """Read one .safetensors file into numpy arrays (f32-widening bf16/f16,
    which numpy cannot represent natively in the safetensors numpy API)."""
    try:
        from safetensors.numpy import load_file

        return dict(load_file(str(path)))
    except (TypeError, ValueError, ImportError):
        # bf16 tensors (or no safetensors wheel): go through torch
        from safetensors.torch import load_file as load_torch

        return {k: v.float().numpy() for k, v in load_torch(str(path)).items()}


def _load_raw_weights(model_dir: Path) -> dict[str, np.ndarray]:
    st = model_dir / "model.safetensors"
    if st.exists():
        return load_safetensors(st)
    # sharded checkpoints: model.safetensors.index.json lists shard files
    idx = model_dir / "model.safetensors.index.json"
    if idx.exists():
        with open(idx, encoding="utf-8") as f:
            weight_map = json.load(f)["weight_map"]
        out: dict[str, np.ndarray] = {}
        for shard in sorted(set(weight_map.values())):
            out.update(load_safetensors(model_dir / shard))
        return out
    pt = model_dir / "pytorch_model.bin"
    if pt.exists():
        import torch

        sd = torch.load(pt, map_location="cpu", weights_only=True)
        return {k: v.float().numpy() for k, v in sd.items()}
    raise FileNotFoundError(
        f"no model.safetensors / pytorch_model.bin under {model_dir}"
    )


def _strip_prefix(raw: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Normalize key prefixes: 'bert.' / 'model.' wrappers drop away."""
    for prefix in ("bert.", "model.", ""):
        if any(k.startswith(prefix + "embeddings.word_embeddings") for k in raw):
            if not prefix:
                return raw
            out = {}
            for k, v in raw.items():
                out[k[len(prefix):] if k.startswith(prefix) else k] = v
            return out
    raise ValueError(
        "unrecognized checkpoint layout: no embeddings.word_embeddings.weight "
        f"key (saw e.g. {sorted(raw)[:5]}); supported layouts are BERT-family "
        "BertModel trees, optionally under a 'bert.'/'model.' prefix"
    )


def convert_bert_params(raw: dict[str, np.ndarray]) -> dict:
    """HF BertModel state dict → this repo's stacked param tree.

    Returns the tree ``encoder._bert_encode`` consumes: per-layer weights
    stacked on axis 0, Linear weights transposed to [in, out]."""
    raw = _strip_prefix(raw)

    def take(key: str) -> np.ndarray:
        if key not in raw:
            raise KeyError(
                f"checkpoint missing {key!r} — not a BERT-family layout?"
            )
        return np.asarray(raw[key], np.float32)

    n_layers = 0
    while f"encoder.layer.{n_layers}.attention.self.query.weight" in raw:
        n_layers += 1
    if n_layers == 0:
        raise ValueError("checkpoint has no encoder.layer.N blocks")

    def stack(fmt: str, transpose: bool = False) -> np.ndarray:
        mats = [take(fmt.format(i)) for i in range(n_layers)]
        if transpose:
            mats = [m.T for m in mats]
        return np.stack(mats)

    layers = {
        "wq": stack("encoder.layer.{}.attention.self.query.weight", transpose=True),
        "bq": stack("encoder.layer.{}.attention.self.query.bias"),
        "wk": stack("encoder.layer.{}.attention.self.key.weight", transpose=True),
        "bk": stack("encoder.layer.{}.attention.self.key.bias"),
        "wv": stack("encoder.layer.{}.attention.self.value.weight", transpose=True),
        "bv": stack("encoder.layer.{}.attention.self.value.bias"),
        "wo": stack("encoder.layer.{}.attention.output.dense.weight", transpose=True),
        "bo": stack("encoder.layer.{}.attention.output.dense.bias"),
        "ln1_scale": stack("encoder.layer.{}.attention.output.LayerNorm.weight"),
        "ln1_bias": stack("encoder.layer.{}.attention.output.LayerNorm.bias"),
        "w1": stack("encoder.layer.{}.intermediate.dense.weight", transpose=True),
        "b1": stack("encoder.layer.{}.intermediate.dense.bias"),
        "w2": stack("encoder.layer.{}.output.dense.weight", transpose=True),
        "b2": stack("encoder.layer.{}.output.dense.bias"),
        "ln2_scale": stack("encoder.layer.{}.output.LayerNorm.weight"),
        "ln2_bias": stack("encoder.layer.{}.output.LayerNorm.bias"),
    }
    params: dict = {
        "tok_emb": take("embeddings.word_embeddings.weight"),
        "pos_emb": take("embeddings.position_embeddings.weight"),
        "type_emb": take("embeddings.token_type_embeddings.weight"),
        "emb_ln_scale": take("embeddings.LayerNorm.weight"),
        "emb_ln_bias": take("embeddings.LayerNorm.bias"),
        "layers": layers,
    }
    if "pooler.dense.weight" in raw:
        params["pooler_w"] = take("pooler.dense.weight").T
        params["pooler_b"] = take("pooler.dense.bias")
    if "classifier.weight" in raw:  # sequence-classification reranker head
        w = take("classifier.weight")  # [num_labels, D]
        if w.shape[0] == 1:
            params["score_head"] = w.T
            if "classifier.bias" in raw:
                params["score_bias"] = take("classifier.bias")[:1]
        elif w.shape[0] == 2:
            # binary relevance head: score = logit(relevant=1) − logit(0)
            # (taking label 0 alone would rank by the IRRELEVANT logit)
            params["score_head"] = (w[1] - w[0]).reshape(-1, 1)
            if "classifier.bias" in raw:
                b = take("classifier.bias")
                params["score_bias"] = (b[1] - b[0]).reshape(1)
        else:
            raise ValueError(
                f"classifier has {w.shape[0]} labels — not a relevance "
                "reranker head (expected 1 or 2)"
            )
    return params


def _detect_pooling(model_dir: Path, default: str = "cls") -> str:
    """sentence-transformers checkpoints carry 1_Pooling/config.json."""
    pool_cfg = model_dir / "1_Pooling" / "config.json"
    if pool_cfg.exists():
        try:
            with open(pool_cfg, encoding="utf-8") as f:
                pc = json.load(f)
            if pc.get("pooling_mode_mean_tokens"):
                return "mean"
            if pc.get("pooling_mode_cls_token"):
                return "cls"
        except (OSError, ValueError):
            logger.warning("unreadable %s; using %s pooling", pool_cfg, default)
    return default


def load_pretrained_encoder(
    model_dir,
    pooling: str | None = None,
    dtype=None,
    attention_impl: str | None = None,
    max_len: int | None = None,
):
    """Load a BERT-family checkpoint directory.

    Returns (params, EncoderConfig, WordPieceTokenizer). ``model_dir``
    needs config.json + model.safetensors (or pytorch_model.bin) +
    vocab.txt — the standard HF export of bge/gte/e5-style models."""
    import jax.numpy as jnp

    from .encoder import EncoderConfig

    model_dir = Path(model_dir)
    with open(model_dir / "config.json", encoding="utf-8") as f:
        hf = json.load(f)
    params = convert_bert_params(_load_raw_weights(model_dir))

    hidden_act = hf.get("hidden_act", "gelu")
    if hidden_act not in ("gelu", "gelu_new", "gelu_pytorch_tanh"):
        raise ValueError(f"unsupported hidden_act {hidden_act!r} (need a GELU family)")
    max_pos = int(hf.get("max_position_embeddings", 512))
    cfg = EncoderConfig(
        arch="bert",
        vocab_size=int(hf["vocab_size"]),
        d_model=int(hf["hidden_size"]),
        n_layers=int(hf["num_hidden_layers"]),
        n_heads=int(hf["num_attention_heads"]),
        d_ff=int(hf["intermediate_size"]),
        max_len=min(max_len or max_pos, max_pos),
        out_dim=int(hf["hidden_size"]),
        dtype=dtype if dtype is not None else jnp.bfloat16,
        ln_eps=float(hf.get("layer_norm_eps", 1e-12)),
        type_vocab_size=int(hf.get("type_vocab_size", 2)),
        gelu_approximate=hidden_act != "gelu",
        pooling=pooling or _detect_pooling(model_dir),
        attention_impl=attention_impl or "xla",
    )
    assert params["tok_emb"].shape == (cfg.vocab_size, cfg.d_model), (
        params["tok_emb"].shape, cfg.vocab_size, cfg.d_model,
    )

    lowercase = hf.get("do_lower_case")
    tok_cfg = model_dir / "tokenizer_config.json"
    if lowercase is None and tok_cfg.exists():
        try:
            with open(tok_cfg, encoding="utf-8") as f:
                lowercase = json.load(f).get("do_lower_case")
        except (OSError, ValueError):
            lowercase = None
    tokenizer = WordPieceTokenizer(
        model_dir / "vocab.txt",
        lowercase=True if lowercase is None else bool(lowercase),
        max_length=cfg.max_len,
    )
    if tokenizer.vocab_size > cfg.vocab_size:
        raise ValueError(
            f"vocab.txt has {tokenizer.vocab_size} ids but the embedding "
            f"matrix holds {cfg.vocab_size}"
        )
    logger.info(
        "loaded %s: L=%d D=%d heads=%d vocab=%d pooling=%s",
        os.path.basename(str(model_dir)), cfg.n_layers, cfg.d_model,
        cfg.n_heads, cfg.vocab_size, cfg.pooling,
    )
    return params, cfg, tokenizer


# ----------------------------------------------------------- decoder imports
# Causal-LM checkpoints for models/decoder.py — the local-LLM slot the
# reference fills with an external OpenAI-compatible service (the env
# contract asserted at utu/__init__.py:8 and consumed by
# utu/utils/agents_utils.py). GPT-2-family and LLaMA-family layouts cover
# the open-weight space (gpt2/distilgpt2, llama/tinyllama/mistral/qwen2).


def convert_gpt2_params(raw: dict[str, np.ndarray]) -> dict:
    """HF GPT2LMHeadModel state dict → the stacked decoder param tree.

    GPT-2 uses Conv1D modules storing weights [in, out] — already the
    einsum layout here, so NO transpose (unlike nn.Linear checkpoints).
    The fused c_attn [D, 3D] splits into wq/wk/wv."""
    raw = {
        (k[len("transformer."):] if k.startswith("transformer.") else k): v
        for k, v in raw.items()
    }

    def take(key: str) -> np.ndarray:
        if key not in raw:
            raise KeyError(f"checkpoint missing {key!r} — not a GPT-2 layout?")
        return np.asarray(raw[key], np.float32)

    n_layers = 0
    while f"h.{n_layers}.attn.c_attn.weight" in raw:
        n_layers += 1
    if n_layers == 0:
        raise ValueError("checkpoint has no h.N transformer blocks")

    def stack(fmt: str) -> np.ndarray:
        return np.stack([take(fmt.format(i)) for i in range(n_layers)])

    qkv_w = stack("h.{}.attn.c_attn.weight")  # [L, D, 3D]
    qkv_b = stack("h.{}.attn.c_attn.bias")  # [L, 3D]
    d = qkv_w.shape[1]
    layers = {
        "ln1_scale": stack("h.{}.ln_1.weight"),
        "ln1_bias": stack("h.{}.ln_1.bias"),
        "wq": qkv_w[:, :, :d], "bq": qkv_b[:, :d],
        "wk": qkv_w[:, :, d : 2 * d], "bk": qkv_b[:, d : 2 * d],
        "wv": qkv_w[:, :, 2 * d :], "bv": qkv_b[:, 2 * d :],
        "wo": stack("h.{}.attn.c_proj.weight"),
        "bo": stack("h.{}.attn.c_proj.bias"),
        "ln2_scale": stack("h.{}.ln_2.weight"),
        "ln2_bias": stack("h.{}.ln_2.bias"),
        "w1": stack("h.{}.mlp.c_fc.weight"),
        "b1": stack("h.{}.mlp.c_fc.bias"),
        "w2": stack("h.{}.mlp.c_proj.weight"),
        "b2": stack("h.{}.mlp.c_proj.bias"),
    }
    return {
        "tok_emb": take("wte.weight"),
        "pos_emb": take("wpe.weight"),
        "layers": layers,
        "final_ln_scale": take("ln_f.weight"),
        "final_ln_bias": take("ln_f.bias"),
    }


def convert_llama_params(raw: dict[str, np.ndarray], tie_embeddings: bool) -> dict:
    """HF LlamaForCausalLM-family state dict (llama/mistral/qwen2) → the
    stacked decoder tree. nn.Linear weights transpose to [in, out]."""
    raw = {
        (k[len("model."):] if k.startswith("model.") else k): v
        for k, v in raw.items()
    }

    def take(key: str) -> np.ndarray:
        if key not in raw:
            raise KeyError(f"checkpoint missing {key!r} — not a LLaMA layout?")
        return np.asarray(raw[key], np.float32)

    n_layers = 0
    while f"layers.{n_layers}.self_attn.q_proj.weight" in raw:
        n_layers += 1
    if n_layers == 0:
        raise ValueError("checkpoint has no layers.N transformer blocks")

    def stack(fmt: str, transpose: bool = True) -> np.ndarray:
        mats = [take(fmt.format(i)) for i in range(n_layers)]
        if transpose:
            mats = [m.T for m in mats]
        return np.stack(mats)

    layers = {
        "ln1_scale": stack("layers.{}.input_layernorm.weight", transpose=False),
        "wq": stack("layers.{}.self_attn.q_proj.weight"),
        "wk": stack("layers.{}.self_attn.k_proj.weight"),
        "wv": stack("layers.{}.self_attn.v_proj.weight"),
        "wo": stack("layers.{}.self_attn.o_proj.weight"),
        "ln2_scale": stack("layers.{}.post_attention_layernorm.weight", transpose=False),
        "w_gate": stack("layers.{}.mlp.gate_proj.weight"),
        "w1": stack("layers.{}.mlp.up_proj.weight"),
        "w2": stack("layers.{}.mlp.down_proj.weight"),
    }
    if "layers.0.self_attn.q_proj.bias" in raw:  # qwen2-style qkv biases
        layers["bq"] = stack("layers.{}.self_attn.q_proj.bias", transpose=False)
        layers["bk"] = stack("layers.{}.self_attn.k_proj.bias", transpose=False)
        layers["bv"] = stack("layers.{}.self_attn.v_proj.bias", transpose=False)
    params = {
        "tok_emb": take("embed_tokens.weight"),
        "layers": layers,
        "final_ln_scale": take("norm.weight"),
    }
    if not tie_embeddings:
        params["lm_head"] = take("lm_head.weight").T
    return params


def load_pretrained_decoder(model_dir, dtype=None, max_len: int | None = None):
    """Load a causal-LM checkpoint directory → (params, DecoderConfig).

    ``model_dir`` needs config.json + model.safetensors (or
    pytorch_model.bin, or a sharded index). The tokenizer loads separately
    (models/bpe.py reads the HF tokenizer.json next to the weights)."""
    import jax.numpy as jnp

    from .decoder import DecoderConfig

    model_dir = Path(model_dir)
    native = model_dir / "decoder_params.npz"
    if native.exists():
        # in-repo-trained native checkpoint (scripts/train_chat_lm.py):
        # decoder_params.npz + decoder_config.json, mirroring the encoder's
        # yrt_tiny_lex format
        from .decoder import load_decoder_config
        from .encoder import load_params_npz

        cfg = load_decoder_config(model_dir / "decoder_config.json")
        params = load_params_npz(native)
        logger.info(
            "loaded native decoder %s: %s L=%d D=%d vocab=%d",
            os.path.basename(str(model_dir)), cfg.arch, cfg.n_layers,
            cfg.d_model, cfg.vocab_size,
        )
        return params, cfg
    with open(model_dir / "config.json", encoding="utf-8") as f:
        hf = json.load(f)
    model_type = hf.get("model_type", "")
    raw = _load_raw_weights(model_dir)

    if model_type == "gpt2":
        params = convert_gpt2_params(raw)
        max_pos = int(hf.get("n_positions", 1024))
        cfg = DecoderConfig(
            arch="gpt2",
            vocab_size=int(hf["vocab_size"]),
            d_model=int(hf["n_embd"]),
            n_layers=int(hf["n_layer"]),
            n_heads=int(hf["n_head"]),
            n_kv_heads=int(hf["n_head"]),
            d_ff=int(hf.get("n_inner") or 4 * hf["n_embd"]),
            max_len=min(max_len or max_pos, max_pos),
            dtype=dtype if dtype is not None else jnp.bfloat16,
            ln_eps=float(hf.get("layer_norm_epsilon", 1e-5)),
            tie_embeddings=True,
            eos_token_id=int(hf.get("eos_token_id", 50256)),
            bos_token_id=hf.get("bos_token_id"),
        )
    elif model_type in ("llama", "mistral", "qwen2"):
        tie = bool(hf.get("tie_word_embeddings", False))
        params = convert_llama_params(raw, tie_embeddings=tie)
        n_heads = int(hf["num_attention_heads"])
        cfg = DecoderConfig(
            arch="llama",
            vocab_size=int(hf["vocab_size"]),
            d_model=int(hf["hidden_size"]),
            n_layers=int(hf["num_hidden_layers"]),
            n_heads=n_heads,
            n_kv_heads=int(hf.get("num_key_value_heads", n_heads)),
            d_ff=int(hf["intermediate_size"]),
            max_len=min(
                max_len or int(hf.get("max_position_embeddings", 4096)),
                int(hf.get("max_position_embeddings", 4096)),
            ),
            dtype=dtype if dtype is not None else jnp.bfloat16,
            rope_base=float(hf.get("rope_theta", 10000.0)),
            ln_eps=float(hf.get("rms_norm_eps", 1e-6)),
            tie_embeddings=tie,
            eos_token_id=int(hf.get("eos_token_id", 2)),
            bos_token_id=hf.get("bos_token_id"),
            qkv_bias="layers.0.self_attn.q_proj.bias"
            in {k.removeprefix("model."): None for k in raw},
        )
    else:
        raise ValueError(
            f"unsupported model_type {model_type!r} (gpt2 / llama / mistral "
            "/ qwen2 layouts are supported)"
        )
    assert params["tok_emb"].shape[0] == cfg.vocab_size, (
        params["tok_emb"].shape, cfg.vocab_size,
    )
    logger.info(
        "loaded decoder %s: %s L=%d D=%d heads=%d/%d vocab=%d",
        os.path.basename(str(model_dir)), cfg.arch, cfg.n_layers,
        cfg.d_model, cfg.n_heads, cfg.n_kv_heads, cfg.vocab_size,
    )
    return params, cfg
