"""GPipe-style pipeline parallelism: parity with the unsharded forward,
param placement (each stage stores 1/S of the trunk), microbatch knob."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from youtu_rag_tpu.models.encoder import EncoderConfig, encode_tokens, init_encoder_params
from youtu_rag_tpu.parallel.mesh import get_mesh
from youtu_rag_tpu.parallel.pipeline_parallel import make_pp_encoder, shard_params_pp

CFG = EncoderConfig(
    vocab_size=256, d_model=32, n_layers=4, n_heads=4, d_ff=64, max_len=64,
    out_dim=16, dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def params():
    return init_encoder_params(CFG, seed=0)


def _batch(rng, b, t):
    ids = rng.integers(4, 256, size=(b, t)).astype(np.int32)
    mask = np.ones((b, t), np.float32)
    for i in range(b):
        mask[i, t - rng.integers(0, t // 4 + 1):] = 0.0
    ids[mask == 0] = 0
    return ids, mask


@pytest.mark.parametrize("stages", [2, 4])
def test_pp_matches_unsharded(params, stages):
    rng = np.random.default_rng(stages)
    ids, mask = _batch(rng, b=8, t=32)
    mesh = get_mesh({"pp": stages})
    fn = make_pp_encoder(CFG, mesh)
    sharded = shard_params_pp(params, mesh)
    emb_pp, cls_pp = fn(sharded, ids, mask)
    emb, cls = encode_tokens(params, jnp.asarray(ids), jnp.asarray(mask), CFG)
    np.testing.assert_allclose(np.asarray(emb_pp), np.asarray(emb), atol=2e-5)
    np.testing.assert_allclose(np.asarray(cls_pp), np.asarray(cls), atol=2e-4)


def test_pp_more_microbatches(params):
    rng = np.random.default_rng(9)
    ids, mask = _batch(rng, b=8, t=16)
    mesh = get_mesh({"pp": 2})
    fn = make_pp_encoder(CFG, mesh, n_micro=4)
    emb_pp, _ = fn(shard_params_pp(params, mesh), ids, mask)
    emb, _ = encode_tokens(params, jnp.asarray(ids), jnp.asarray(mask), CFG)
    np.testing.assert_allclose(np.asarray(emb_pp), np.asarray(emb), atol=2e-5)


def test_pp_param_placement(params):
    """Layer stacks shard the leading (layer) axis: each stage's shard
    holds n_layers / S layers."""
    mesh = get_mesh({"pp": 4})
    sharded = shard_params_pp(params, mesh)
    wq = sharded["layers"]["wq"]
    shard = next(iter(wq.addressable_shards))
    assert shard.data.shape[0] == CFG.n_layers // 4
    assert sharded["tok_emb"].is_fully_replicated


def test_pp_batch_must_divide(params):
    mesh = get_mesh({"pp": 4})
    fn = make_pp_encoder(CFG, mesh)
    ids = np.ones((3, 16), np.int32)  # 3 % 4 != 0
    mask = np.ones((3, 16), np.float32)
    with pytest.raises(AssertionError):
        fn(shard_params_pp(params, mesh), ids, mask)
