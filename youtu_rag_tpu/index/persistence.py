"""Index persistence: snapshot + restore + incremental-build manifest.

The reference's persistence is Chroma's sqlite dir / FAISS ``.index`` +
pickle sidecar written on every add (``faiss_store.py:76-87``); its
"checkpointing" is the etag/metadata/derived-files hash triple that lets
builds skip unchanged sources (``kb_config_routes.py:504-605``,
SURVEY.md §5.4). Here:

- ``save_index``/``load_index`` — one ``.npz`` with the device arrays
  (vectors as uint16-viewed bf16), plus a JSON sidecar with chunks,
  metadata schema and config. Snapshots are atomic (tmp + rename).
- ``BuildManifest`` — content-hash manifest for incremental re-embedding:
  a source is skipped when its (etag, metadata_hash) pair is unchanged.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import numpy as np

from ..core.config import IndexConfig
from ..core.types import Chunk
from ..utils.hashing import content_etag, md5_hex
from ..utils.log import get_logger
from .device_index import DeviceVectorIndex
from .metadata import MetadataSchema

logger = get_logger("index.persistence")

_FORMAT_VERSION = 1


def save_index(index: DeviceVectorIndex, path: str | Path) -> None:
    """Write a snapshot: ``<path>.npz`` (arrays) + ``<path>.json`` (host state)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)

    live = [(r, c) for r, c in enumerate(index._chunks) if c is not None]
    rows = np.asarray([r for r, _ in live], np.int64)
    arrays: dict[str, np.ndarray] = {}
    if getattr(index, "_int4", False):
        # raw packed nibbles + scales: exact storage round-trip at 1/8 the
        # f32 bytes. Full packed width is kept (columns interleave across
        # the low/high halves, so a [:, :dim] slice is not meaningful).
        q = np.asarray(index._vectors)
        arrays["vectors_p4"] = q[rows] if len(rows) else np.zeros((0, index._vec_cols), np.int8)
        sc = np.asarray(index._scales)
        arrays["scales"] = sc[rows] if len(rows) else np.zeros(0, np.float32)
    elif getattr(index, "_int8", False):
        # raw int8 + scales: exact storage round-trip, quarter the bytes
        q = np.asarray(index._vectors)
        arrays["vectors_q"] = q[rows][:, : index.dim] if len(rows) else np.zeros((0, index.dim), np.int8)
        sc = np.asarray(index._scales)
        arrays["scales"] = sc[rows] if len(rows) else np.zeros(0, np.float32)
    else:
        # pull the RAW storage (bf16 round-trips via ml_dtypes) and widen
        # host-side — dequantized_vectors() would materialize a 2x f32
        # copy on device and OOM large bf16 indexes
        raw = np.asarray(index._vectors)
        arrays["vectors"] = (
            raw[rows][:, : index.dim].astype(np.float32)
            if len(rows)
            else np.zeros((0, index.dim), np.float32)
        )
    cols = np.asarray(index._cols)[rows] if len(rows) else np.zeros((0, index.schema.max_columns), np.int32)

    meta = {
        "format_version": _FORMAT_VERSION,
        "dim": index.dim,
        "metric": index.metric,
        "config": index.config.model_dump(),
        "schema": index.schema.to_dict(),
        # IVF is positional (cluster-sorted rows + block ranges), which a
        # save/load cycle invalidates (tombstones compact away). Record
        # that it was built so load_index re-clusters automatically.
        "ivf": {"n_lists": index._ivf.n_lists} if getattr(index, "_ivf", None) else None,
        "chunks": [
            {
                "id": c.id,
                "document_id": c.document_id,
                "content": c.content,
                "chunk_index": c.chunk_index,
                "metadata": c.metadata,
            }
            for _, c in live
        ],
    }

    tmp_npz = tempfile.NamedTemporaryFile(
        dir=path.parent, suffix=".npz.tmp", delete=False
    )
    try:
        np.savez_compressed(tmp_npz, cols=cols, **arrays)
        tmp_npz.close()
        os.replace(tmp_npz.name, f"{path}.npz")
    except BaseException:
        tmp_npz.close()
        os.unlink(tmp_npz.name)
        raise
    tmp_json = Path(f"{path}.json.tmp")
    tmp_json.write_text(json.dumps(meta, ensure_ascii=False))
    os.replace(tmp_json, f"{path}.json")
    logger.info("saved index snapshot: %d chunks -> %s", len(live), path)


def load_index(path: str | Path, config: IndexConfig | None = None, mesh=None) -> DeviceVectorIndex:
    path = Path(path)
    meta = json.loads(Path(f"{path}.json").read_text())
    assert meta["format_version"] == _FORMAT_VERSION, meta["format_version"]
    with np.load(f"{path}.npz") as data:
        if "vectors_p4" in data:  # int4 snapshot: unpack + dequantize
            packed = data["vectors_p4"]
            hi = packed >> 4
            lo = (packed.astype(np.int8) << 4).astype(np.int8) >> 4
            nib = np.concatenate([lo, hi], axis=1).astype(np.float32)
            vectors = (nib * data["scales"][:, None])[:, : meta["dim"]]
        elif "vectors_q" in data:  # int8 snapshot: dequantize for re-insert
            vectors = data["vectors_q"].astype(np.float32) * data["scales"][:, None]
        else:
            vectors = data["vectors"].astype(np.float32)

    cfg = config or IndexConfig.model_validate(meta["config"])
    if mesh is not None:
        from ..parallel.sharded_index import ShardedVectorIndex

        index = ShardedVectorIndex(meta["dim"], cfg, mesh=mesh)
    else:
        index = DeviceVectorIndex(meta["dim"], cfg)
    index.schema = MetadataSchema.from_dict(meta["schema"])
    chunks = [
        Chunk(c["id"], c["document_id"], c["content"], c["chunk_index"], c["metadata"])
        for c in meta["chunks"]
    ]
    if chunks:
        index.add(chunks, vectors)
    if meta.get("ivf") and chunks:
        index.build_ivf(n_lists=meta["ivf"]["n_lists"])
    logger.info("loaded index snapshot: %d chunks <- %s", len(chunks), path)
    return index


# ---------------------------------------------------------------------------
# Incremental-build manifest (ref semantics: kb_config_routes.py:504-605)
# ---------------------------------------------------------------------------


@dataclass
class SourceRecord:
    source_id: str
    etag: str
    metadata_hash: str = ""
    derived_files_hash: str = ""
    chunk_count: int = 0


@dataclass
class BuildManifest:
    sources: dict[str, SourceRecord] = field(default_factory=dict)

    @staticmethod
    def hash_metadata(metadata: dict[str, Any] | None) -> str:
        return md5_hex(json.dumps(metadata or {}, sort_keys=True, ensure_ascii=False))

    @staticmethod
    def hash_content(data: bytes | str) -> str:
        return content_etag(data)

    def needs_rebuild(
        self, source_id: str, etag: str, metadata_hash: str = "", derived_files_hash: str = ""
    ) -> bool:
        rec = self.sources.get(source_id)
        if rec is None:
            return True
        return (
            rec.etag != etag
            or rec.metadata_hash != metadata_hash
            or rec.derived_files_hash != derived_files_hash
        )

    def record(
        self,
        source_id: str,
        etag: str,
        metadata_hash: str = "",
        derived_files_hash: str = "",
        chunk_count: int = 0,
    ) -> None:
        self.sources[source_id] = SourceRecord(
            source_id, etag, metadata_hash, derived_files_hash, chunk_count
        )

    def forget(self, source_id: str) -> None:
        self.sources.pop(source_id, None)

    def save(self, path: str | Path) -> None:
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        tmp = Path(f"{p}.tmp")
        tmp.write_text(
            json.dumps({sid: vars(r) for sid, r in self.sources.items()}, ensure_ascii=False)
        )
        os.replace(tmp, p)

    @classmethod
    def load(cls, path: str | Path) -> "BuildManifest":
        p = Path(path)
        if not p.exists():
            return cls()
        data = json.loads(p.read_text())
        return cls(sources={sid: SourceRecord(**r) for sid, r in data.items()})
