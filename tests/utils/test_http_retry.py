"""Hermetic tests for utils/http.py (ref behavior: utu/rag/utils/http_retry.py).

MockTransport stands in for the remote service; no sockets."""

import asyncio

import httpx
import pytest

from youtu_rag_tpu.utils.http import post_json_with_retry


def _transport(script):
    """script: list of (status, json_body); each call pops the next entry."""
    calls = {"n": 0}

    def handler(request: httpx.Request) -> httpx.Response:
        status, body = script[min(calls["n"], len(script) - 1)]
        calls["n"] += 1
        return httpx.Response(status, json=body)

    return httpx.MockTransport(handler), calls


def _run(coro):
    return asyncio.run(coro)


def test_retries_transient_then_succeeds():
    t, calls = _transport([(503, {}), (502, {}), (200, {"ok": True})])
    out = _run(post_json_with_retry("http://svc/x", {}, transport=t, backoff=0.0))
    assert out == {"ok": True}
    assert calls["n"] == 3


def test_non_retryable_raises_immediately():
    t, calls = _transport([(404, {"detail": "nope"})])
    with pytest.raises(httpx.HTTPStatusError):
        _run(post_json_with_retry("http://svc/x", {}, transport=t, backoff=0.0))
    assert calls["n"] == 1  # 4xx must not be retried (http_retry.py:85-88)


def test_exhausted_retries_raise_runtime_error():
    t, calls = _transport([(503, {})])
    with pytest.raises(RuntimeError, match="failed after 3 attempts"):
        _run(post_json_with_retry("http://svc/x", {}, transport=t, backoff=0.0))
    assert calls["n"] == 3


def test_custom_retry_statuses():
    # with 500 removed from the retryable set it must raise on first try
    t, calls = _transport([(500, {})])
    with pytest.raises(httpx.HTTPStatusError):
        _run(
            post_json_with_retry(
                "http://svc/x", {}, transport=t, backoff=0.0, retry_statuses=(502, 503)
            )
        )
    assert calls["n"] == 1
