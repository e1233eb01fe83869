"""dp-sharded embedder inference + multichip dryrun variants."""

import numpy as np
import pytest


def test_embedder_dp_sharded_matches_single():
    from youtu_rag_tpu.models.embedder import TpuEmbedder
    from youtu_rag_tpu.models.encoder import EncoderConfig
    from youtu_rag_tpu.parallel.mesh import get_mesh

    cfg = EncoderConfig(
        vocab_size=512, d_model=32, n_layers=2, n_heads=2, d_ff=64, max_len=32, out_dim=16
    )
    mesh = get_mesh({"dp": 8})
    single = TpuEmbedder(config=cfg, batch_size=16, seed=3)
    sharded = TpuEmbedder(config=cfg, batch_size=16, mesh=mesh, seed=3)
    texts = [f"document number {i} about topic {i % 3}" for i in range(16)]
    a = single.embed_batch(texts)
    b = sharded.embed_batch(texts)
    np.testing.assert_allclose(a, b, atol=2e-2)


@pytest.mark.parametrize("n", [2, 4, 8])
def test_dryrun_multichip_sizes(n):
    import __graft_entry__ as g

    g.dryrun_multichip(n)
