"""PythonExecutorToolkit: execution + the concurrent-workspace race.

The eval harness rolls agents out under a semaphore of 4
(eval/benchmark.py); before round 5 the executor wrote every snippet to
the SAME ``snippet.py``, so a concurrent call could overwrite a script
between its write and its subprocess start — csv questions in
bench_eval.py failed ~60% of the time while serial runs passed."""

import asyncio

from youtu_rag_tpu.tools.base import ToolkitConfig
from youtu_rag_tpu.tools.builtin import PythonExecutorToolkit


def test_execute_basic(tmp_path):
    tk = PythonExecutorToolkit(ToolkitConfig(config={"workspace": str(tmp_path)}))
    out = asyncio.run(tk.call_tool("execute_python_code", {"code": "print(6 * 7)"}))
    assert out.strip() == "42"


def test_stderr_captured(tmp_path):
    tk = PythonExecutorToolkit(ToolkitConfig(config={"workspace": str(tmp_path)}))
    out = asyncio.run(tk.call_tool("execute_python_code", {"code": "raise ValueError('boom')"}))
    assert "ValueError" in out and "boom" in out


def test_concurrent_calls_isolated(tmp_path):
    """Every concurrent call must see ITS OWN script — a shared filename
    lets one call's code replace another's before the subprocess starts."""
    tk = PythonExecutorToolkit(
        ToolkitConfig(config={"workspace": str(tmp_path), "timeout": 60.0})
    )

    async def run_all():
        codes = [f"print('token_{i:02d}')" for i in range(6)]
        return await asyncio.gather(*(
            tk.call_tool("execute_python_code", {"code": c}) for c in codes
        ))

    outs = asyncio.run(run_all())
    for i, out in enumerate(outs):
        assert out.strip() == f"token_{i:02d}", outs
    # scripts are cleaned up after execution
    assert not list(tmp_path.glob("snippet_*.py"))
