"""Decoder runtime: HF checkpoint parity + KV-cache/generation invariants.

Parity gates (the pattern of test_pretrained.py, applied to the causal-LM
slot): a random ``GPT2LMHeadModel`` / ``LlamaForCausalLM`` safetensors
checkpoint must produce the same logits from the JAX scan-stacked forward
as from the torch forward; the cached decode path must match the no-cache
teacher-forced forward position by position; batching/padding must not
change any row's tokens. Ref slot: the external LLM service the reference
requires at ``utu/__init__.py:8``."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from youtu_rag_tpu.models.decoder import (
    DecoderConfig,
    causal_logits,
    decode_step,
    decoder_sharding_spec,
    generate,
    init_cache,
    init_decoder_params,
    left_pad_batch,
    position_ids_from_mask,
    prefill,
    sample_token,
)
from youtu_rag_tpu.models.pretrained import load_pretrained_decoder


def _save_gpt2(tmp_path, seed=0):
    torch.manual_seed(seed)
    cfg = transformers.GPT2Config(
        vocab_size=96, n_positions=64, n_embd=32, n_layer=2, n_head=2,
        activation_function="gelu_new", layer_norm_epsilon=1e-5,
        bos_token_id=0, eos_token_id=0,
    )
    model = transformers.GPT2LMHeadModel(cfg).eval()
    d = tmp_path / "gpt2"
    model.save_pretrained(str(d), safe_serialization=True)
    return d, model


def _save_llama(tmp_path, seed=0, n_kv=1, tie=False):
    torch.manual_seed(seed)
    cfg = transformers.LlamaConfig(
        vocab_size=96, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=n_kv,
        intermediate_size=64, max_position_embeddings=64,
        rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=tie, bos_token_id=1, eos_token_id=2,
    )
    model = transformers.LlamaForCausalLM(cfg).eval()
    d = tmp_path / f"llama_kv{n_kv}"
    model.save_pretrained(str(d), safe_serialization=True)
    return d, model


def _torch_logits(model, ids):
    with torch.no_grad():
        return model(torch.tensor([ids])).logits[0].float().numpy()


def test_gpt2_logit_parity(tmp_path):
    d, model = _save_gpt2(tmp_path)
    params, cfg = load_pretrained_decoder(d, dtype=jnp.float32)
    assert cfg.arch == "gpt2" and cfg.n_layers == 2
    ids = [5, 17, 42, 3, 88, 11, 7]
    ours = causal_logits(
        params, jnp.asarray([ids]), jnp.ones((1, len(ids))), cfg
    )[0]
    ref = _torch_logits(model, ids)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("n_kv,tie", [(1, False), (2, False), (4, True)])
def test_llama_logit_parity(tmp_path, n_kv, tie):
    d, model = _save_llama(tmp_path, n_kv=n_kv, tie=tie)
    params, cfg = load_pretrained_decoder(d, dtype=jnp.float32)
    assert cfg.arch == "llama" and cfg.n_kv_heads == n_kv
    assert cfg.tie_embeddings == tie
    ids = [1, 9, 30, 61, 2, 44, 15, 77]
    ours = causal_logits(
        params, jnp.asarray([ids]), jnp.ones((1, len(ids))), cfg
    )[0]
    ref = _torch_logits(model, ids)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-3, rtol=1e-3)


def _tiny_cfg(**kw):
    base = dict(
        vocab_size=64, d_model=32, n_layers=2, n_heads=4, n_kv_heads=2,
        d_ff=64, max_len=32, arch="llama", dtype=jnp.float32,
        eos_token_id=0,
    )
    base.update(kw)
    return DecoderConfig(**base)


@pytest.mark.parametrize("arch", ["llama", "gpt2"])
def test_cache_matches_teacher_forced(arch):
    cfg = _tiny_cfg(arch=arch, n_kv_heads=4 if arch == "gpt2" else 2)
    params = init_decoder_params(cfg, seed=3)
    ids = np.array([[7, 3, 9, 1, 22, 40]], np.int32)
    t = ids.shape[1]
    mask = np.ones_like(ids, np.float32)
    full = np.asarray(causal_logits(params, jnp.asarray(ids), jnp.asarray(mask), cfg))

    # prefill on the first 3 tokens, decode the rest one by one
    n0 = 3
    cache = init_cache(cfg, 1, t)
    logits, cache = prefill(
        params, jnp.asarray(ids[:, :n0]), jnp.asarray(mask[:, :n0]), cache, cfg
    )
    np.testing.assert_allclose(np.asarray(logits), full[:, n0 - 1], atol=1e-4)
    attn = np.zeros((1, t), np.float32)
    attn[:, :n0] = 1.0
    for i in range(n0, t):
        attn[:, i] = 1.0
        logits, cache = decode_step(
            params,
            jnp.asarray(ids[:, i]),
            jnp.int32(i),
            jnp.asarray(attn),
            jnp.asarray([i], jnp.int32),
            cache,
            cfg,
        )
        np.testing.assert_allclose(
            np.asarray(logits), full[:, i], atol=1e-4,
            err_msg=f"divergence at position {i}",
        )


def test_left_pad_invariance():
    """A short row in a left-padded batch decodes exactly as it would alone."""
    cfg = _tiny_cfg()
    params = init_decoder_params(cfg, seed=1)
    short = [5, 11, 2]
    longer = [9, 8, 7, 6, 5, 4, 3]
    toks, mask = left_pad_batch([short, longer], pad_id=0, bucket=False)
    assert toks.shape == (2, len(longer))
    key = jax.random.PRNGKey(0)
    out_b, len_b = generate(
        params, jnp.asarray(toks), jnp.asarray(mask), key, cfg=cfg,
        max_new_tokens=8, temperature=0.0,
    )
    solo, mask1 = left_pad_batch([short], pad_id=0, bucket=False)
    out_s, len_s = generate(
        params, jnp.asarray(solo), jnp.asarray(mask1), key, cfg=cfg,
        max_new_tokens=8, temperature=0.0,
    )
    np.testing.assert_array_equal(np.asarray(out_b)[0], np.asarray(out_s)[0])
    assert int(np.asarray(len_b)[0]) == int(np.asarray(len_s)[0])


def test_generate_greedy_deterministic_and_eos_padded():
    cfg = _tiny_cfg()
    params = init_decoder_params(cfg, seed=2)
    toks, mask = left_pad_batch([[3, 1, 4], [1, 5]], pad_id=0)
    a1, l1 = generate(params, jnp.asarray(toks), jnp.asarray(mask),
                      jax.random.PRNGKey(7), cfg=cfg, max_new_tokens=6)
    a2, l2 = generate(params, jnp.asarray(toks), jnp.asarray(mask),
                      jax.random.PRNGKey(99), cfg=cfg, max_new_tokens=6)
    # greedy ignores the PRNG key
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    a1, l1 = np.asarray(a1), np.asarray(l1)
    for b in range(2):
        n = int(l1[b])
        assert 0 <= n <= 6
        # beyond a row's EOS the buffer is EOS-padded
        assert (a1[b, n:] == cfg.eos_token_id).all() or n == 6


def test_greedy_matches_teacher_forced_rollout():
    """generate(temperature=0) must equal an argmax rollout through the
    no-cache forward — ties the whole cache+loop machinery to the parity-
    tested path."""
    cfg = _tiny_cfg(eos_token_id=63)  # unlikely token: no early stop
    params = init_decoder_params(cfg, seed=5)
    prompt = [7, 3, 9]
    toks, mask = left_pad_batch([prompt], pad_id=0, bucket=False)
    out, _ = generate(params, jnp.asarray(toks), jnp.asarray(mask),
                      jax.random.PRNGKey(0), cfg=cfg, max_new_tokens=5)
    seq = list(prompt)
    for _ in range(5):
        lg = causal_logits(
            params, jnp.asarray([seq]), jnp.ones((1, len(seq))), cfg
        )
        seq.append(int(np.argmax(np.asarray(lg)[0, -1])))
    np.testing.assert_array_equal(np.asarray(out)[0], np.asarray(seq[len(prompt):]))


def test_sample_token_top_k_and_top_p():
    logits = jnp.asarray([[0.0, 1.0, 2.0, 10.0]])
    key = jax.random.PRNGKey(0)
    # top_k=1 at any temperature is argmax
    for s in range(5):
        tok = sample_token(logits, jax.random.PRNGKey(s), temperature=1.0, top_k=1)
        assert int(tok[0]) == 3
    # top_p tiny keeps only the head of the distribution
    for s in range(5):
        tok = sample_token(logits, jax.random.PRNGKey(s), temperature=1.0, top_p=0.1)
        assert int(tok[0]) == 3
    # greedy path
    assert int(sample_token(logits, key)[0]) == 3


def test_position_ids_from_mask_left_pad():
    mask = jnp.asarray([[0, 0, 1, 1, 1], [1, 1, 1, 1, 1]], jnp.float32)
    pos = np.asarray(position_ids_from_mask(mask))
    np.testing.assert_array_equal(pos[0], [0, 0, 0, 1, 2])
    np.testing.assert_array_equal(pos[1], [0, 1, 2, 3, 4])


def test_sharding_spec_covers_every_leaf():
    for arch, kv in (("gpt2", 4), ("llama", 2)):
        cfg = _tiny_cfg(arch=arch, n_kv_heads=kv, tie_embeddings=False)
        params = init_decoder_params(cfg)
        spec = decoder_sharding_spec(cfg)
        p_leaves = {jax.tree_util.keystr(k) for k, _ in
                    jax.tree_util.tree_flatten_with_path(params)[0]}
        s_leaves = {jax.tree_util.keystr(k) for k, _ in
                    jax.tree_util.tree_flatten_with_path(spec)[0]}
        assert p_leaves == s_leaves, (arch, p_leaves ^ s_leaves)


def test_tp_sharded_generate_matches_single_device():
    """Full generate under a ('dp','tp') mesh must emit the same tokens."""
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    cfg = _tiny_cfg()
    params = init_decoder_params(cfg, seed=4)
    toks, mask = left_pad_batch([[3, 1, 4, 1], [5, 9, 2, 6]], pad_id=0, bucket=False)
    key = jax.random.PRNGKey(0)
    base, _ = generate(params, jnp.asarray(toks), jnp.asarray(mask), key,
                       cfg=cfg, max_new_tokens=4)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("dp", "tp"))
    spec = decoder_sharding_spec(cfg)
    flat, treedef = jax.tree_util.tree_flatten(params)
    flat_spec = treedef.flatten_up_to(spec)
    sh_params = jax.tree_util.tree_unflatten(treedef, [
        jax.device_put(x, NamedSharding(mesh, s)) for x, s in zip(flat, flat_spec)
    ])
    data_sh = NamedSharding(mesh, P("dp", None))
    out, _ = generate(
        sh_params,
        jax.device_put(jnp.asarray(toks), data_sh),
        jax.device_put(jnp.asarray(mask), data_sh),
        key, cfg=cfg, max_new_tokens=4,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base))
