"""OCR client: scanned PDFs/images → markdown derived files.

Parity with the reference's OCR pipeline (``routes/minio_files.py:182-280``
``_process_ocr`` posting to an OCR model service and storing per-page
markdown derivatives; loaders then prefer ``*_ocr.md``,
``pdf_loader.py:17-148``). The client is an HTTP adapter (env
``YRT_OCR_URL`` / ``UTU_OCR_URL``); offline it reports cleanly and the
pipeline continues with the original file."""

from __future__ import annotations

import asyncio
import base64
import os
from pathlib import Path

from ..utils.log import get_logger

logger = get_logger("ingest.ocr")

OCR_EXTENSIONS = {".pdf", ".png", ".jpg", ".jpeg", ".tiff", ".bmp", ".webp"}


class RemoteOCRClient:
    def __init__(self, base_url: str | None = None, timeout: float = 300.0, max_retries: int = 3):
        self.base_url = base_url or os.environ.get("YRT_OCR_URL") or os.environ.get("UTU_OCR_URL")
        self.timeout = timeout
        self.max_retries = max_retries

    @property
    def available(self) -> bool:
        return bool(self.base_url)

    async def ocr_to_markdown(self, data: bytes, filename: str) -> str:
        """POST the document, return combined per-page markdown."""
        if not self.available:
            raise RuntimeError("OCR is not configured (set YRT_OCR_URL)")
        import httpx

        payload = {
            "filename": filename,
            "data": base64.b64encode(data).decode(),
            "output": "markdown",
        }
        last: Exception | None = None
        async with httpx.AsyncClient(timeout=self.timeout) as client:
            for attempt in range(self.max_retries):
                try:
                    r = await client.post(f"{self.base_url.rstrip('/')}/ocr", json=payload)
                    if r.status_code in (502, 503):
                        raise httpx.HTTPStatusError("retryable", request=r.request, response=r)
                    r.raise_for_status()
                    body = r.json()
                    pages = body.get("pages")
                    if pages:  # per-page markdown list (ref page structure)
                        return "\n\n".join(
                            f"# Page {i + 1}\n\n{p.get('markdown', p) if isinstance(p, dict) else p}"
                            for i, p in enumerate(pages)
                        )
                    return body.get("markdown", "")
                except Exception as e:  # noqa: BLE001
                    last = e
                    await asyncio.sleep(2**attempt)
        raise RuntimeError(f"OCR failed after {self.max_retries} retries: {last}")


def needs_ocr(filename: str) -> bool:
    return Path(filename).suffix.lower() in OCR_EXTENSIONS


async def process_ocr_to_store(file_store, bucket: str, name: str, client: RemoteOCRClient | None = None) -> str | None:
    """Run OCR on an uploaded file and persist ``<stem>_ocr.md`` beside it
    (the derived file the loaders prefer). Returns the derived name, or
    None when OCR is unconfigured/not applicable."""
    client = client or RemoteOCRClient()
    if not client.available or not needs_ocr(name):
        return None
    data = file_store.download(bucket, name)
    markdown = await client.ocr_to_markdown(data, name)
    derived = f"{Path(name).stem}_ocr.md"
    file_store.upload(bucket, derived, markdown.encode("utf-8"), {"derived_from": name, "kind": "ocr"})
    logger.info("OCR derived file stored: %s", derived)
    return derived
