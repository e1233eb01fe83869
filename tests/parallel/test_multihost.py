"""Multi-host DCN story (VERDICT r1 #2, SURVEY §5.8).

- hybrid DCN×ICI mesh construction (single-process emulation here),
- the sharded index over a tuple ("dcn","ici") axis,
- a REAL 2-process × 4-device CPU run (subprocess-spawned,
  jax.distributed + Gloo collectives) checking search parity."""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from youtu_rag_tpu.core.config import IndexConfig
from youtu_rag_tpu.core.types import Chunk
from youtu_rag_tpu.index.numpy_ref import NumpyVectorIndex
from youtu_rag_tpu.parallel.mesh import get_hybrid_mesh, init_distributed, is_multi_process
from youtu_rag_tpu.parallel.sharded_index import ShardedVectorIndex


def test_hybrid_mesh_single_process_emulation():
    mesh = get_hybrid_mesh({"ici": 4}, {"dcn": 2})
    assert mesh.shape == {"dcn": 2, "ici": 4}
    mesh2 = get_hybrid_mesh({"ici": -1}, {"dcn": 2})
    assert mesh2.shape["ici"] == 4
    assert not is_multi_process(mesh.devices.flat)


def test_init_distributed_noop_single_process():
    assert init_distributed() is False  # no env configured → no-op


def test_sharded_index_over_hybrid_mesh():
    rng = np.random.default_rng(7)
    d = 32
    cfg = IndexConfig(min_capacity=1024, block_rows=64)
    mesh = get_hybrid_mesh({"ici": 4}, {"dcn": 2})
    idx = ShardedVectorIndex(d, cfg, mesh=mesh, axis=("dcn", "ici"))
    assert idx.n_shards == 8
    ref = NumpyVectorIndex(d, cfg, quantize_bf16=True)
    chunks = [Chunk(f"h{i}", "doc", f"t{i}", i, {"i": i}) for i in range(300)]
    embs = rng.normal(size=(300, d)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    idx.add(chunks, embs)
    ref.add(chunks, embs)
    q = rng.normal(size=(4, d)).astype(np.float32)
    got = idx.search(q, top_k=8, filters={"i": {"$lt": 200}})
    want = ref.search(q, top_k=8, filters={"i": {"$lt": 200}})
    for g, w in zip(got, want):
        assert [c.id for c, _ in g] == [c.id for c, _ in w]
    # IVF works on the single-process hybrid mesh too
    idx.build_ivf(n_lists=4)
    hits = idx.search(embs[:1], top_k=1)[0]
    assert hits[0][0].id == "h0"


_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    import numpy as np
    from youtu_rag_tpu.parallel.mesh import get_hybrid_mesh, init_distributed
    from youtu_rag_tpu.parallel.sharded_index import ShardedVectorIndex
    from youtu_rag_tpu.index.numpy_ref import NumpyVectorIndex
    from youtu_rag_tpu.core.config import IndexConfig
    from youtu_rag_tpu.core.types import Chunk

    assert init_distributed(), "distributed init expected"
    assert jax.process_count() == 2 and jax.device_count() == 8

    mesh = get_hybrid_mesh({{"ici": -1}}, {{"dcn": -1}})
    assert mesh.shape == {{"dcn": 2, "ici": 4}}, mesh.shape

    rng = np.random.default_rng(3)  # same seed both processes: SPMD build
    d, n = 32, 160
    cfg = IndexConfig(min_capacity=512, block_rows=64)
    idx = ShardedVectorIndex(d, cfg, mesh=mesh, axis=("dcn", "ici"))
    assert idx._multi_process
    chunks = [Chunk(f"m{{i}}", "doc", f"t{{i}}", i, {{"i": i}}) for i in range(n)]
    embs = rng.normal(size=(n, d)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    idx.add(chunks, embs)

    ref = NumpyVectorIndex(d, cfg, quantize_bf16=True)
    ref.add(chunks, embs)
    q = rng.normal(size=(2, d)).astype(np.float32)
    got = idx.search(q, top_k=5, filters={{"i": {{"$lt": 100}}}})
    want = ref.search(q, top_k=5, filters={{"i": {{"$lt": 100}}}})
    for g, w in zip(got, want):
        assert [c.id for c, _ in g] == [c.id for c, _ in w], (g, w)

    # delete propagates (tombstone bias over the global mesh)
    victim = got[0][0][0].id
    idx.delete([victim])
    ref.delete([victim])
    after = idx.search(q[:1], top_k=5)[0]
    assert victim not in [c.id for c, _ in after]

    # IVF build on the multi-process mesh: device-side k-means fit +
    # assignment, shard-local cluster sort. n_probe (default 64) covers
    # all 4 lists so results stay exact → brute parity must hold.
    idx.build_ivf(n_lists=4)
    got = idx.search(q, top_k=5, filters={{"i": {{"$lt": 100}}}})
    want = ref.search(q, top_k=5, filters={{"i": {{"$lt": 100}}}})
    for g, w in zip(got, want):
        assert [c.id for c, _ in g] == [c.id for c, _ in w], (g, w)

    # compact on the multi-process mesh: cross-shard permutation gathers
    # live rows to the front; dead tail becomes reusable
    more = [c.id for c, _ in idx.search(q[1:], top_k=3)[0]]
    idx.delete(more)
    ref.delete(more)
    idx.compact()
    assert idx.size == idx.live_count == n - 1 - len(more), (idx.size, idx.live_count)
    got = idx.search(q, top_k=5)
    want = ref.search(q, top_k=5)
    for g, w in zip(got, want):
        assert [c.id for c, _ in g] == [c.id for c, _ in w], (g, w)

    # append after compact reuses tail rows, and growth past min_capacity
    # runs the jitted concat (eager concat would crash multi-process)
    extra = 420
    chunks2 = [Chunk(f"x{{i}}", "doc2", f"u{{i}}", i, {{"i": 1000 + i}}) for i in range(extra)]
    embs2 = rng.normal(size=(extra, d)).astype(np.float32)
    embs2 /= np.linalg.norm(embs2, axis=1, keepdims=True)
    idx.add(chunks2, embs2)
    ref.add(chunks2, embs2)
    assert idx.capacity > 512  # grew
    got = idx.search(embs2[:2], top_k=3)
    want = ref.search(embs2[:2], top_k=3)
    for g, w in zip(got, want):
        assert [c.id for c, _ in g] == [c.id for c, _ in w], (g, w)

    # int8 storage lane: append (jitted scale scatter), IVF, compact
    cfg8 = IndexConfig(min_capacity=512, block_rows=64, storage_dtype="int8")
    idx8 = ShardedVectorIndex(d, cfg8, mesh=mesh, axis=("dcn", "ici"))
    idx8.add(chunks, embs)
    hits = idx8.search(embs[:1], top_k=1)[0]
    assert hits[0][0].id == "m0"
    idx8.build_ivf(n_lists=4)
    hits = idx8.search(embs[:1], top_k=1)[0]
    assert hits[0][0].id == "m0"
    idx8.delete(["m1", "m2"])
    idx8.compact()
    assert idx8.live_count == n - 2
    hits = idx8.search(embs[:1], top_k=1)[0]
    assert hits[0][0].id == "m0"

    # int4 packed lane: append, growth past capacity (the host int8
    # shadow must grow with the multi-process _grow override), two-stage
    # host re-rank, compact
    cfg4 = IndexConfig(min_capacity=512, block_rows=64, storage_dtype="int4")
    idx4 = ShardedVectorIndex(d, cfg4, mesh=mesh, axis=("dcn", "ici"))
    idx4.add(chunks, embs)
    hits = idx4.search(embs[:1], top_k=1)[0]
    assert hits[0][0].id == "m0" and hits[0][1] > 0.98  # shadow-precision
    idx4.add(chunks2, embs2)  # growth: shadow arrays must follow
    assert idx4.capacity > 512
    assert idx4._host_q8.shape[0] == idx4.capacity
    hits = idx4.search(embs2[:1], top_k=1)[0]
    assert hits[0][0].id == "x0"
    idx4.delete(["m1", "m2"])
    idx4.compact()
    hits = idx4.search(embs[:1], top_k=1)[0]
    assert hits[0][0].id == "m0" and hits[0][1] > 0.98
    idx4.build_ivf(n_lists=4)  # multi-process IVF over packed rows
    hits = idx4.search(embs[:1], top_k=1)[0]
    assert hits[0][0].id == "m0" and hits[0][1] > 0.98

    print(f"MULTIHOST-PARITY-OK pid={{os.environ['JAX_PROCESS_ID']}}", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_dcn_parity(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    prog = _WORKER.format(repo=repo)
    port = 23987
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
        )
        env.pop("XLA_FLAGS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", prog],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=360)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        assert "MULTIHOST-PARITY-OK" in out, out[-2000:]
