"""LM training stack: BPE trainer, ReAct episode synth, masked-CE trainer,
native decoder checkpoint round-trip. Ref slot: the reference trains
nothing (external LLM service, ``utu/__init__.py:8``)."""

import json
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from youtu_rag_tpu.agents.react import parse_react
from youtu_rag_tpu.models.bpe import BPETokenizer, train_bpe
from youtu_rag_tpu.models.decoder import (
    DecoderConfig,
    causal_logits,
    init_decoder_params,
    load_decoder_config,
    save_decoder_config,
)
from youtu_rag_tpu.models.lm_synth import (
    _tool_schemas,
    render_episode_samples,
    synth_episode,
)
from youtu_rag_tpu.models.train_lm import (
    LMTrainConfig,
    encode_samples,
    lm_loss,
    make_lm_optimizer,
    make_lm_train_step,
    make_sharded_lm_train_step,
    pack_batch,
)

CORPUS = [
    "Thought: I should look this up in the knowledge base.",
    "Action: kb_embedding_search",
    'Action Input: {"query": "What is the mass of Boku?"}',
    "Final Answer: 42 kg",
    "The color of Zalu-7 is teal. Ruka has a mass of 17 kg.",
] * 4


# ------------------------------------------------------------- BPE trainer


def test_train_bpe_learns_merges_and_roundtrips():
    tok = train_bpe(CORPUS, vocab_size=400)
    assert tok.vocab_size <= 400
    assert len(tok.ranks) > 0  # learned actual merges
    for text in CORPUS:
        ids = tok.encode(text)
        assert tok.decode(ids) == text
    # frequent scaffolding compresses: fewer tokens than bytes
    s = "Action Input: "
    assert len(tok.encode(s)) < len(s.encode())


def test_train_bpe_save_json_roundtrip(tmp_path):
    tok = train_bpe(CORPUS, vocab_size=350)
    tok.save_json(tmp_path / "tokenizer.json")
    tok2 = BPETokenizer.from_tokenizer_json(tmp_path / "tokenizer.json")
    for text in CORPUS + ["unseen zibo text 123!"]:
        assert tok.encode(text) == tok2.encode(text)
    assert tok2.eos_token == "<|endoftext|>"
    assert tok2.eos_id == tok.eos_id


def test_train_bpe_deterministic():
    a = train_bpe(CORPUS, vocab_size=320)
    b = train_bpe(CORPUS, vocab_size=320)
    assert a.vocab == b.vocab and list(a.ranks) == list(b.ranks)


# --------------------------------------------------------------- synthesis


def test_episode_targets_parse_through_serving_parser():
    rng = random.Random(3)
    tools = _tool_schemas()
    for _ in range(10):
        ep = synth_episode(rng)
        (p1, t1), (p2, t2) = render_episode_samples(ep, tools)
        # turn 1: the serving-side parser must recover the tool call
        _, calls, final = parse_react(t1)
        assert final is None and len(calls) == 1
        assert calls[0].name == "kb_embedding_search"
        assert json.loads(calls[0].arguments)["query"] == ep.query
        assert ep.query.split()[-1] in ep.question  # attr keyword
        # turn 2: final answer extraction
        _, calls2, final2 = parse_react(t2)
        assert not calls2 and final2 == ep.answer
        # prompts end with the assistant cue; observation holds the answer
        assert p1.endswith("assistant:") and p2.endswith("assistant:")
        assert ep.answer in p2 and ep.gold_chunk in ep.observation
        assert ep.question in p1


def test_episode_answer_only_in_gold_chunk():
    rng = random.Random(11)
    for _ in range(20):
        ep = synth_episode(rng)
        assert ep.answer in ep.gold_chunk
        for d in ep.distractors:
            assert ep.answer not in d


# ----------------------------------------------------------------- batching


def test_encode_samples_truncates_prompt_front():
    tok = train_bpe(CORPUS, vocab_size=300)
    long_prompt = "x " * 500 + "KEEP-THE-TAIL"
    enc = encode_samples([(long_prompt, "yes")], tok, max_len=64, eos_id=tok.eos_id)
    ids, p_len = enc[0]
    assert len(ids) <= 64
    assert "KEEP-THE-TAIL" in tok.decode(list(ids[:p_len]))


def test_pack_batch_masks():
    tok = train_bpe(CORPUS, vocab_size=300)
    enc = encode_samples([("ab", "cd"), ("a b c", "d")], tok, 16, tok.eos_id)
    b = pack_batch(enc, 16, pad_id=tok.eos_id)
    assert b["tokens"].shape == (2, 16)
    for i, (ids, p_len) in enumerate(enc):
        n = len(ids)
        assert b["mask"][i, :n].all() and not b["mask"][i, n:].any()
        assert not b["loss_mask"][i, :p_len].any()
        assert b["loss_mask"][i, p_len:n].all()


# ------------------------------------------------------------------ trainer


def _tiny_cfg(vocab=384):
    return DecoderConfig(
        vocab_size=vocab, d_model=32, n_layers=2, n_heads=4, n_kv_heads=4,
        d_ff=64, max_len=64, arch="llama", dtype=jnp.float32, eos_token_id=0,
    )


def _toy_batch(cfg, b=8, t=32, seed=0):
    rng = np.random.default_rng(seed)
    tokens = rng.integers(1, 50, (b, t)).astype(np.int32)
    tokens[:, 1::2] = tokens[:, 0::2]  # learnable: every odd repeats prev
    mask = np.ones((b, t), np.float32)
    loss_mask = np.zeros((b, t), np.float32)
    loss_mask[:, t // 2 :] = 1.0
    return {k: jnp.asarray(v) for k, v in
            {"tokens": tokens, "mask": mask, "loss_mask": loss_mask}.items()}


def test_lm_loss_respects_loss_mask():
    cfg = _tiny_cfg()
    params = init_decoder_params(cfg, 0)
    tc = LMTrainConfig()
    batch = _toy_batch(cfg)
    # zero mask -> zero loss (denominator guard, no NaN)
    b0 = dict(batch)
    b0["loss_mask"] = jnp.zeros_like(batch["loss_mask"])
    assert float(lm_loss(params, b0, cfg, tc)) == 0.0
    # garbage tokens in unmasked positions must not change the loss
    b1 = dict(batch)
    toks = np.asarray(batch["tokens"]).copy()
    toks[:, : toks.shape[1] // 2 - 1] = 7  # strictly before any label idx
    b1["tokens"] = jnp.asarray(toks)
    l_a = float(lm_loss(params, batch, cfg, tc))
    l_b = float(lm_loss(params, b1, cfg, tc))
    assert l_a != l_b  # conditioning DOES flow through the prompt
    # but masked-label positions never contribute as labels:
    lm = np.asarray(batch["loss_mask"]).copy()
    b2 = dict(batch)
    b2["loss_mask"] = jnp.asarray(lm)
    assert float(lm_loss(params, b2, cfg, tc)) == pytest.approx(l_a)


def test_train_step_reduces_loss():
    cfg = _tiny_cfg()
    params = init_decoder_params(cfg, 0)
    tc = LMTrainConfig(learning_rate=3e-3, warmup_steps=5, total_steps=60)
    opt = make_lm_optimizer(tc)
    opt_state = opt.init(params)
    step = make_lm_train_step(cfg, tc, opt)
    batch = _toy_batch(cfg)
    first = None
    for i in range(60):
        params, opt_state, m = step(params, opt_state, batch)
        if first is None:
            first = float(m["loss"])
    last = float(m["loss"])
    assert last < first * 0.5, (first, last)


def test_sharded_lm_train_step_matches_single():
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("dp", "tp"))
    cfg = _tiny_cfg()
    params = init_decoder_params(cfg, 0)
    tc = LMTrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10)
    opt = make_lm_optimizer(tc)

    step1 = make_lm_train_step(cfg, tc, opt)
    p1, s1 = params, opt.init(params)
    stepN, place_params, place_batch = make_sharded_lm_train_step(
        cfg, tc, opt, mesh, params
    )
    pN = place_params(params)
    sN = opt.init(pN)
    batch = _toy_batch(cfg, b=8)
    for _ in range(3):
        p1, s1, m1 = step1(p1, s1, batch)
        pN, sN, mN = stepN(pN, sN, place_batch(batch))
    assert float(m1["loss"]) == pytest.approx(float(mN["loss"]), rel=2e-4)
    a = jax.tree.leaves(p1)[1]
    b = jax.tree.leaves(jax.device_get(pN))[1]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


# -------------------------------------------------------- native checkpoint


def test_native_decoder_checkpoint_roundtrip(tmp_path):
    from youtu_rag_tpu.models.encoder import save_params_npz
    from youtu_rag_tpu.models.pretrained import load_pretrained_decoder

    cfg = _tiny_cfg()
    params = init_decoder_params(cfg, 3)
    params_f16 = jax.tree.map(lambda v: np.asarray(v, np.float16), params)
    save_params_npz(params_f16, tmp_path / "decoder_params.npz")
    save_decoder_config(cfg, tmp_path / "decoder_config.json")

    params2, cfg2 = load_pretrained_decoder(tmp_path)
    assert cfg2 == cfg
    toks = jnp.asarray(np.arange(12, dtype=np.int32)[None])
    mask = jnp.ones_like(toks, jnp.float32)
    l1 = causal_logits(params, toks, mask, cfg)
    l2 = causal_logits(
        jax.tree.map(lambda v: v.astype(jnp.float32), params2), toks, mask, cfg2
    )
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=2e-2)


def test_decoder_config_json_roundtrip(tmp_path):
    cfg = _tiny_cfg()
    save_decoder_config(cfg, tmp_path / "c.json")
    assert load_decoder_config(tmp_path / "c.json") == cfg
