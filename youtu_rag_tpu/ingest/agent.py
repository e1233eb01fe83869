"""KnowledgeBuilderAgent: the staged multi-source build pipeline.

Parity with ``utu/rag/knowledge_builder/agent.py:32-1091``:
  Stage 0  analyze sources + check incremental state (config_analyzer.py)
  Stage 1  group tasks {text, table, qa, database} (:658)
  Stage 2  parallel asyncio processing with per-source error isolation and
           progress callbacks (:743-830)
  Stage 3  QA associations (:981)
  then a BuildReport (:1034).

Incremental skip: per-source etag + metadata-hash + derived-files-hash
triple via BuildManifest (ref: kb_config_routes.py:504-605)."""

from __future__ import annotations

import asyncio
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable

from ..core.config import KnowledgeBuilderConfig
from ..core.types import BaseEmbedder
from ..index.persistence import BuildManifest
from ..retrieval.store import TpuVectorStore
from ..utils.log import get_logger
from .processors import (
    FileProcessorFactory,
    ProcessResult,
    ProcessorContext,
    SourceTask,
)
from .tables import TableStore

logger = get_logger("ingest.agent")


@dataclass
class BuildRequest:
    kb_name: str = "default"
    tasks: list[SourceTask] = field(default_factory=list)
    rebuild: bool = False
    incremental: bool = True


@dataclass
class BuildReport:
    kb_name: str
    total_sources: int = 0
    processed: int = 0
    skipped: int = 0
    failed: int = 0
    total_chunks: int = 0
    tables: list[str] = field(default_factory=list)
    errors: list[str] = field(default_factory=list)
    duration_s: float = 0.0
    results: list[ProcessResult] = field(default_factory=list)

    def summary(self) -> dict[str, Any]:
        return {
            "kb": self.kb_name,
            "sources": self.total_sources,
            "processed": self.processed,
            "skipped": self.skipped,
            "failed": self.failed,
            "chunks": self.total_chunks,
            "tables": self.tables,
            "errors": self.errors,
            "duration_s": round(self.duration_s, 3),
        }


class KnowledgeBuilderAgent:
    def __init__(
        self,
        kb_name: str,
        store: TpuVectorStore,
        embedder: BaseEmbedder,
        tables: TableStore | None = None,
        config: KnowledgeBuilderConfig | None = None,
        manifest: BuildManifest | None = None,
        on_progress: Callable[[str, str, int, int], None] | None = None,
    ):
        self.config = config or KnowledgeBuilderConfig()
        self.tables = tables or TableStore()
        self.ctx = ProcessorContext(kb_name, store, embedder, self.tables, self.config)
        self.manifest = manifest or BuildManifest()
        self.on_progress = on_progress
        self._lock = asyncio.Lock()

    def _progress(self, source: str, status: str, done: int, total: int) -> None:
        if self.on_progress:
            try:
                self.on_progress(source, status, done, total)
            except Exception:  # noqa: BLE001
                logger.exception("progress callback failed")

    # -- stage 0: analysis -------------------------------------------------

    def analyze(self, request: BuildRequest) -> dict[str, Any]:
        """Source statistics + per-source plan incl. incremental skips
        (ref: KnowledgeBuilderAnalyzer.analyze, config_analyzer.py:98-533)."""
        plans = []
        by_kind: dict[str, int] = {}
        for task in request.tasks:
            kind = FileProcessorFactory.task_kind(task)
            by_kind[kind] = by_kind.get(kind, 0) + 1
            etag, meta_hash = self._hashes(task)
            skip = (
                request.incremental
                and not request.rebuild
                and not self.manifest.needs_rebuild(task.source_id, etag, meta_hash)
            )
            plans.append(
                {
                    "source_id": task.source_id,
                    "kind": kind,
                    "etag": etag,
                    "metadata_hash": meta_hash,
                    "action": "skip" if skip else "process",
                }
            )
        return {"total": len(request.tasks), "by_kind": by_kind, "plans": plans}

    @staticmethod
    def _hashes(task: SourceTask) -> tuple[str, str]:
        if task.path and Path(task.path).exists():
            etag = BuildManifest.hash_content(Path(task.path).read_bytes())
        elif task.document is not None:
            etag = BuildManifest.hash_content(task.document.content)
        else:
            etag = BuildManifest.hash_content(
                "".join(f"{p.get('question')}{p.get('answer')}" for p in task.qa_pairs)
            )
        return etag, BuildManifest.hash_metadata(task.metadata)

    # -- main --------------------------------------------------------------

    async def build(self, request: BuildRequest) -> BuildReport:
        async with self._lock:
            t0 = time.perf_counter()
            report = BuildReport(kb_name=request.kb_name, total_sources=len(request.tasks))
            analysis = self.analyze(request)
            plan_by_id = {p["source_id"]: p for p in analysis["plans"]}

            # stage 1: task groups — qa runs after text/table (associations
            # may reference built files, ref stage 3 ordering)
            main_tasks = [t for t in request.tasks if plan_by_id[t.source_id]["kind"] != "qa"]
            qa_tasks = [t for t in request.tasks if plan_by_id[t.source_id]["kind"] == "qa"]

            done_counter = {"n": 0}
            total = len(request.tasks)
            sem = asyncio.Semaphore(self.config.max_workers)

            async def run_one(task: SourceTask) -> None:
                plan = plan_by_id[task.source_id]
                if plan["action"] == "skip":
                    report.skipped += 1
                    done_counter["n"] += 1
                    self._progress(task.source_id, "skipped", done_counter["n"], total)
                    return
                async with sem:
                    self._progress(task.source_id, "running", done_counter["n"], total)
                    try:
                        proc = FileProcessorFactory.create(plan["kind"], self.ctx)
                        result = await proc.process(task)
                        report.results.append(result)
                        report.processed += 1
                        report.total_chunks += result.chunks
                        report.tables.extend(result.tables)
                        self.manifest.record(
                            task.source_id,
                            plan["etag"],
                            plan["metadata_hash"],
                            chunk_count=result.chunks,
                        )
                        status = "completed"
                    except Exception as e:  # noqa: BLE001 - per-source isolation
                        logger.exception("source %s failed", task.source_id)
                        report.failed += 1
                        report.errors.append(f"{task.source_id}: {e}")
                        report.results.append(
                            ProcessResult(task.source_id, ok=False, error=str(e))
                        )
                        status = "failed"
                    done_counter["n"] += 1
                    self._progress(task.source_id, status, done_counter["n"], total)

            # stage 2: parallel main sources
            await asyncio.gather(*(run_one(t) for t in main_tasks))
            # stage 3: qa associations
            await asyncio.gather(*(run_one(t) for t in qa_tasks))

            report.duration_s = time.perf_counter() - t0
            logger.info("build report: %s", report.summary())
            return report
