"""Async HTTP POST with transient-failure retry.

Parity with ``utu/rag/utils/http_retry.py:16-103`` (make_request_with_retry):
retry on 502/503-style transient statuses, timeouts and connection errors
with backoff; raise non-retryable HTTP errors (4xx, other 5xx) immediately.
Differences from the reference: async (httpx, not blocking requests), the
retryable-status set is configurable (LLM endpoints also want 429/500), and
a transport can be injected for hermetic tests.

This is the single retry path for every remote-service adapter (LLM chat,
service embedder, Jina-style reranker, OCR) — the reference duplicates the
loop per client (openai_embedder.py:24-49, openai_reranker.py:38-56,
chunk_processor.py:259-341)."""

from __future__ import annotations

import asyncio
import logging
from typing import Any

from .log import get_logger

logger = get_logger("utils.http")

#: statuses worth retrying: rate limit, transient upstream failures,
#: gateway errors while a service starts up (ref http_retry.py:69-83).
RETRYABLE_STATUSES: tuple[int, ...] = (429, 500, 502, 503)


async def post_json_with_retry(
    url: str,
    payload: dict,
    *,
    headers: dict[str, str] | None = None,
    timeout: float = 60.0,
    max_retries: int = 3,
    backoff: float = 1.5,
    retry_statuses: tuple[int, ...] = RETRYABLE_STATUSES,
    log: logging.Logger | None = None,
    transport: Any = None,
) -> dict:
    """POST ``payload`` as JSON; return the decoded JSON response.

    Retries up to ``max_retries`` times on ``retry_statuses``, timeouts and
    connection errors, sleeping ``backoff**attempt`` seconds between tries.
    Any other HTTP error status raises ``httpx.HTTPStatusError`` without
    retrying (ref http_retry.py:85-88)."""
    import httpx

    lg = log or logger
    last: Exception | None = None
    async with httpx.AsyncClient(timeout=timeout, transport=transport) as client:
        for attempt in range(max_retries):
            try:
                r = await client.post(url, json=payload, headers=headers or {})
                if r.status_code in retry_statuses:
                    last = RuntimeError(f"HTTP {r.status_code} from {url}")
                    lg.warning(
                        "attempt %d/%d: retryable HTTP %d from %s",
                        attempt + 1, max_retries, r.status_code, url,
                    )
                else:
                    r.raise_for_status()  # 4xx / other 5xx: non-retryable
                    return r.json()
            except httpx.HTTPStatusError:
                raise
            except httpx.HTTPError as e:  # timeout / connect / protocol
                last = e
                lg.warning("attempt %d/%d: %s: %s", attempt + 1, max_retries, type(e).__name__, e)
            if attempt < max_retries - 1:
                await asyncio.sleep(backoff**attempt)
    raise RuntimeError(f"POST {url} failed after {max_retries} attempts: {last}")
