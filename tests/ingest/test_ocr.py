import asyncio
import tempfile

import pytest

from youtu_rag_tpu.api.state import LocalFileStore
from youtu_rag_tpu.ingest.ocr import RemoteOCRClient, needs_ocr, process_ocr_to_store


def test_needs_ocr():
    assert needs_ocr("scan.pdf") and needs_ocr("photo.JPG")
    assert not needs_ocr("notes.md") and not needs_ocr("data.csv")


def test_unconfigured_is_clean(tmp_path, monkeypatch):
    monkeypatch.delenv("YRT_OCR_URL", raising=False)
    monkeypatch.delenv("UTU_OCR_URL", raising=False)
    client = RemoteOCRClient()
    assert not client.available
    with pytest.raises(RuntimeError, match="not configured"):
        asyncio.run(client.ocr_to_markdown(b"x", "a.pdf"))
    store = LocalFileStore(tmp_path)
    store.upload("uploads", "scan.pdf", b"fake pdf")
    # pipeline no-ops cleanly without an endpoint
    out = asyncio.run(process_ocr_to_store(store, "uploads", "scan.pdf"))
    assert out is None


def test_ocr_derived_file_flow(tmp_path):
    """Fake OCR client → derived markdown stored → loader prefers it."""

    class FakeOCR(RemoteOCRClient):
        def __init__(self):
            super().__init__(base_url="http://fake")

        async def ocr(self, data, filename):
            return {"pages": [{"markdown": "OCR extracted text about rockets."}]}

    store = LocalFileStore(tmp_path)
    store.upload("uploads", "scan.pdf", b"%PDF fake")
    derived = asyncio.run(process_ocr_to_store(store, "uploads", "scan.pdf", client=FakeOCR()))
    assert derived == "scan_ocr.md"
    assert b"rockets" in store.download("uploads", derived)
    meta = store.stat("uploads", derived)
    assert meta["user_metadata"]["derived_from"] == "scan.pdf"

    # loader picks up the derived markdown instead of the raw pdf
    from youtu_rag_tpu.ingest.loaders import load_document

    path = store.local_path("uploads", "scan.pdf")
    docs = load_document(str(path))
    assert docs[0].metadata["derived"] == "ocr"
    assert "rockets" in docs[0].content
