"""Serving the committed trained encoder (benchmarks/models/yrt_tiny_lex)
through the production factory path (EmbeddingConfig.weights_dir)."""

import pathlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from youtu_rag_tpu.core.config import EmbeddingConfig  # noqa: E402
from youtu_rag_tpu.models.embedder import EmbedderFactory, TpuEmbedder  # noqa: E402

WEIGHTS = pathlib.Path(__file__).parents[2] / "benchmarks" / "models" / "yrt_tiny_lex"


@pytest.fixture(scope="module")
def embedder():
    return EmbedderFactory.create(
        EmbeddingConfig(provider="tpu", weights_dir=str(WEIGHTS), batch_size=8)
    )


def test_factory_loads_committed_model(embedder):
    assert isinstance(embedder, TpuEmbedder)
    assert embedder.cfg.lex_pool and embedder.cfg.lex_buckets == 1024
    assert embedder.dimension == embedder.cfg.out_dim + 1024


def test_exact_identifier_ranking(embedder):
    """The committed weights' headline property: an exact-identifier query
    ranks the chunk containing that identifier above a same-template
    sibling — checkable without the full quality benchmark."""
    docs = [
        "Maintenance log for unit KL-4407. The inventory tag recorded for "
        "unit KL-4407 is 88213.",
        "Maintenance log for unit QX-9911. The inventory tag recorded for "
        "unit QX-9911 is 55120.",
        "An unrelated paragraph about glacier hydrology field surveys.",
    ]
    q = "What is the inventory tag recorded for KL-4407?"
    vecs = embedder.embed_batch(docs + [q])
    d, qv = vecs[:3], vecs[3]
    scores = d @ qv
    assert scores[0] > scores[1] > scores[2]
    assert np.isfinite(vecs).all()
