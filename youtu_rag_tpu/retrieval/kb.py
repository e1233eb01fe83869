"""KnowledgeBase: one named collection bundling store + embedder +
retriever + builder, plus a process-wide registry.

The reference resolves KBs through SQLite rows + per-KB YAML configs
(``utu/rag/rag_tools/base_toolkit.py:93-137``, ``knowledge_builder/
agent.py:319-330``); here a KnowledgeBase is a first-class object the API
layer registers and toolkits resolve by name."""

from __future__ import annotations

from typing import Any

from ..core.config import RAGConfig
from ..core.types import Document, RetrievalResult
from ..ingest.builder import KnowledgeBuilder
from ..models.embedder import EmbedderFactory
from ..models.reranker import RerankerFactory
from ..utils.log import get_logger
from .context import ContextAssembler
from .retriever import HybridRetriever, VectorRetriever
from .store import TpuVectorStore, VectorStoreFactory

logger = get_logger("retrieval.kb")


class KnowledgeBase:
    def __init__(self, name: str, config: RAGConfig | None = None, mesh=None):
        self.name = name
        self.config = config or RAGConfig(name=name)
        self.store: TpuVectorStore = VectorStoreFactory.create(self.config.vector_store, mesh=mesh)
        emb_kwargs = {}
        if mesh is not None:
            from ..parallel.mesh import is_multi_process

            if not is_multi_process(mesh.devices.flat):
                # multi-chip serving: embed data-parallel over the SAME
                # devices the index shards across (tpu provider only;
                # hash/remote providers ignore the kwarg). Multi-process
                # meshes skip this — embed_batch feeds host-local arrays,
                # which cannot land on non-addressable devices.
                from jax.sharding import Mesh as _Mesh

                emb_kwargs["mesh"] = _Mesh(mesh.devices.reshape(-1), ("dp",))
        self.embedder = EmbedderFactory.create(
            self.config.knowledge_builder.embedding, **emb_kwargs
        )
        self.reranker = RerankerFactory.create(self.config.reranker)
        self.retriever = VectorRetriever(
            self.store, self.embedder, self.config.retriever, reranker=self.reranker
        )
        self.hybrid_retriever = HybridRetriever(
            self.store, self.embedder, self.config.retriever, reranker=self.reranker
        )
        self.builder = KnowledgeBuilder(
            self.store, self.embedder, self.config.knowledge_builder
        )
        self.assembler = ContextAssembler()
        # staged-builder state (created lazily; persisted when the API
        # attaches a directory): one TableStore + incremental manifest per
        # KB so table/database sources and text2sql share a registry
        self._tables = None
        self._manifest = None
        self._builder_agent = None
        self._persist_dir = None

    # -- staged builder (ingest agent) -------------------------------------

    @property
    def tables(self):
        if self._tables is None:
            from ..ingest.tables import TableStore

            path = ":memory:"
            if self._persist_dir is not None:
                path = str(self._persist_dir / "tables.sqlite")
            self._tables = TableStore(path)
        return self._tables

    @property
    def manifest(self):
        if self._manifest is None:
            from ..index.persistence import BuildManifest

            mf = None
            if self._persist_dir is not None:
                p = self._persist_dir / "manifest.json"
                if p.exists():
                    try:
                        mf = BuildManifest.load(p)
                    except Exception:  # noqa: BLE001 - corrupt manifest → full rebuild
                        logger.exception("manifest load failed; rebuilding from scratch")
            self._manifest = mf or BuildManifest()
        return self._manifest

    def attach_persistence(self, directory) -> None:
        """Give the staged-builder state a home on disk (API data dir):
        the table registry becomes sqlite-backed and the incremental
        manifest survives restarts. Call before the first build."""
        from pathlib import Path

        self._persist_dir = Path(directory)
        self._persist_dir.mkdir(parents=True, exist_ok=True)

    @property
    def builder_agent(self):
        """The full staged knowledge builder (analyze → group → parallel
        process → QA stage) over this KB's store/embedder/tables
        (ref: KnowledgeBuilderAgent wiring in the KB build routes,
        utu/rag/api/routes/knowledge_base.py build path)."""
        if self._builder_agent is None:
            from ..ingest.agent import KnowledgeBuilderAgent

            self._builder_agent = KnowledgeBuilderAgent(
                self.name,
                self.store,
                self.embedder,
                tables=self.tables,
                config=self.config.knowledge_builder,
                manifest=self.manifest,
            )
        return self._builder_agent

    async def build_sources(self, tasks, rebuild: bool = False, on_progress=None):
        """Build through the staged ingest agent: source tasks route to the
        text/table/database/qa processors with incremental skip; the
        manifest persists when a directory is attached."""
        from ..ingest.agent import BuildRequest

        agent = self.builder_agent
        agent.on_progress = on_progress
        try:
            report = await agent.build(
                BuildRequest(kb_name=self.name, tasks=list(tasks), rebuild=rebuild)
            )
        finally:
            agent.on_progress = None
        if self._persist_dir is not None:
            try:
                self.manifest.save(self._persist_dir / "manifest.json")
            except OSError:
                logger.exception("manifest save failed")
        await self.warmup()
        return report

    async def build_documents(self, documents: list[Document], rebuild: bool = False):
        status = await self.builder.build_from_documents(documents, rebuild=rebuild)
        await self.warmup()
        return status

    async def warmup(self) -> None:
        """Pre-compile the search path so the first user query is not
        compile-bound (cold-compile can take tens of seconds on TPU)."""
        try:
            if await self.store.count() > 0:
                await self.retriever.retrieve("warmup", top_k=1, similarity_threshold=0.0)
                if self.config.vector_store.coalesce_window_ms > 0:
                    # coalesced bursts land in pow2 query buckets — warm the
                    # common ones so the first real burst isn't compile-bound
                    import numpy as _np

                    dim = getattr(self.embedder, "dimension", None) or self.store._dim
                    if dim:
                        for bucket in (8, 32):
                            await self.store.search_batch(
                                _np.zeros((bucket, dim), _np.float32), top_k=self.config.retriever.top_k
                            )
        except Exception:  # noqa: BLE001 - warmup must never fail a build
            logger.exception("search warmup failed")

    async def build_files(self, paths: list[str], rebuild: bool = False):
        from ..ingest.loaders import load_document

        docs: list[Document] = []
        for p in paths:
            docs.extend(load_document(p))
        return await self.build_documents(docs, rebuild=rebuild)

    async def search(
        self,
        query: str,
        top_k: int | None = None,
        filters: dict[str, Any] | None = None,
        **kwargs,
    ) -> list[RetrievalResult]:
        return await self.retriever.retrieve(query, top_k=top_k, filters=filters, **kwargs)

    def save(self, directory: str) -> dict[str, Any]:
        """Snapshot the KB: index arrays + chunks + schema (+ manifest when
        the builder agent is used separately). Atomic per artifact."""
        from pathlib import Path

        from ..index.persistence import save_index

        d = Path(directory)
        d.mkdir(parents=True, exist_ok=True)
        if self.store._index is None:
            raise RuntimeError("empty knowledge base; nothing to snapshot")
        save_index(self.store._index, d / "index")
        import json as _json

        tmp = d / "kb.json.tmp"
        tmp.write_text(_json.dumps({"name": self.name, "config": self.config.model_dump()}))
        tmp.replace(d / "kb.json")  # atomic per artifact
        return {"directory": str(d), "chunks": self.store._index.count()}

    def load(self, directory: str) -> dict[str, Any]:
        """Restore a snapshot into this KB (replaces current contents).

        The restored engine honors the store's configuration: the mesh
        (sharded KBs stay sharded) and the numpy test backend (rebuilt in
        that engine rather than silently switching to the device index).
        The snapshot dimension must match this KB's embedder."""
        from pathlib import Path

        from ..index.persistence import load_index

        d = Path(directory)
        idx = load_index(d / "index", mesh=self.store._mesh)
        emb_dim = getattr(self.embedder, "dimension", None)
        if emb_dim and emb_dim != idx.dim:
            raise ValueError(
                f"snapshot dimension {idx.dim} != embedder dimension {emb_dim}; "
                "restore into a KB configured with the matching embedding model"
            )
        if self.config.vector_store.backend == "numpy":
            import numpy as _np

            target = self.store._make_index(idx.dim)
            chunks = list(idx.iter_live())
            if chunks:
                rows = [idx._id_to_row[c.id] for c in chunks]
                embs = _np.asarray(idx.dequantize_take(_np.asarray(rows)))[:, : idx.dim]
                target.add(chunks, embs)
            idx = target
        self.store._index = idx
        self.store._dim = idx.dim
        # snapshots carry no postings — repopulate BM25 from live chunks
        self.store.rebuild_lexical()
        return {"directory": str(d), "chunks": idx.count()}

    async def stats(self) -> dict[str, Any]:
        out = {
            "name": self.name,
            "chunks": await self.store.count(),
            "backend": self.config.vector_store.backend,
            "embedder": type(self.embedder).__name__,
            "description": self.config.description,
            "storage_dtype": self.config.vector_store.index.storage_dtype,
        }
        if hasattr(self.embedder, "stats"):  # CoalescingEmbedder dispatch counters
            out["embedder_stats"] = dict(self.embedder.stats)
        return out


class KBRegistry:
    """Process-wide name → KnowledgeBase map (the API layer's source of
    truth; ref analog: the knowledge_bases SQLite table +
    _create_retriever cache)."""

    def __init__(self):
        # single-threaded tornado loop + synchronous get_or_create → no
        # lock needed (one would imply a concurrency guarantee this
        # registry doesn't provide)
        self._kbs: dict[str, KnowledgeBase] = {}

    def get(self, name: str) -> KnowledgeBase | None:
        return self._kbs.get(name)

    def get_or_create(self, name: str, config: RAGConfig | None = None, mesh=None) -> KnowledgeBase:
        kb = self._kbs.get(name)
        if kb is None:
            kb = KnowledgeBase(name, config, mesh=mesh)
            self._kbs[name] = kb
        return kb

    def register(self, kb: KnowledgeBase) -> None:
        self._kbs[kb.name] = kb

    def remove(self, name: str) -> bool:
        return self._kbs.pop(name, None) is not None

    def names(self) -> list[str]:
        return sorted(self._kbs)


GLOBAL_KB_REGISTRY = KBRegistry()
