import asyncio
import time

from youtu_rag_tpu.utils.cache import async_file_cache


def test_cache_hits_and_ttl(tmp_path):
    calls = {"n": 0}

    @async_file_cache(ttl_seconds=1000, cache_dir=tmp_path)
    async def expensive(x: int) -> str:
        calls["n"] += 1
        return f"result-{x}"

    async def go():
        a = await expensive(1)
        b = await expensive(1)  # cached
        c = await expensive(2)  # different key
        return a, b, c

    a, b, c = asyncio.run(go())
    assert a == b == "result-1" and c == "result-2"
    assert calls["n"] == 2


def test_cache_expiry(tmp_path):
    calls = {"n": 0}

    @async_file_cache(ttl_seconds=0.01, cache_dir=tmp_path)
    async def fn() -> int:
        calls["n"] += 1
        return calls["n"]

    assert asyncio.run(fn()) == 1
    time.sleep(0.05)
    assert asyncio.run(fn()) == 2  # expired → recomputed


def test_cache_method_binding(tmp_path):
    class Toolkit:
        def __init__(self, label):
            self.label = label

        @async_file_cache(cache_dir=tmp_path)
        async def lookup(self, q: str) -> str:
            return f"{q}!"

    # different instances share the cache (self excluded from the key)
    a = Toolkit("a")
    b = Toolkit("b")
    assert asyncio.run(a.lookup("x")) == "x!"
    assert asyncio.run(b.lookup("x")) == "x!"


def test_cache_disabled_env(tmp_path, monkeypatch):
    calls = {"n": 0}

    @async_file_cache(cache_dir=tmp_path)
    async def fn() -> int:
        calls["n"] += 1
        return calls["n"]

    monkeypatch.setenv("YRT_NO_RESULT_CACHE", "1")
    asyncio.run(fn())
    asyncio.run(fn())
    assert calls["n"] == 2


def test_unserializable_result_passthrough(tmp_path):
    @async_file_cache(cache_dir=tmp_path)
    async def fn():
        return object()  # not JSON-serializable

    out = asyncio.run(fn())
    assert out is not None  # no crash; simply not cached
