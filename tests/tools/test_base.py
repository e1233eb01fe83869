import asyncio

import pytest

from youtu_rag_tpu.tools.base import AsyncBaseToolkit, ToolRouter, ToolkitConfig, register_tool
from youtu_rag_tpu.tools.schema import function_schema, parse_docstring


class DemoToolkit(AsyncBaseToolkit):
    @register_tool
    async def add_numbers(self, a: int, b: int = 3) -> str:
        """Add two integers together.

        Args:
            a: The first number.
            b: The second number, defaults to three.
        """
        return str(a + b)

    @register_tool("shout")
    async def _shout_impl(self, text: str) -> str:
        """Uppercase the text.

        Args:
            text: The text to uppercase.
        """
        return text.upper()

    async def not_a_tool(self) -> str:
        return "hidden"


def test_tools_map_discovery():
    tk = DemoToolkit()
    assert set(tk.tools_map) == {"add_numbers", "shout"}


def test_activated_tools_filter():
    tk = DemoToolkit(ToolkitConfig(activated_tools=["shout"]))
    assert list(tk.get_tools_map_func()) == ["shout"]
    with pytest.raises(AssertionError):
        DemoToolkit(ToolkitConfig(activated_tools=["nope"])).get_tools_map_func()


def test_openai_schema():
    tk = DemoToolkit()
    schemas = {s["function"]["name"]: s for s in tk.get_tools_in_openai()}
    f = schemas["add_numbers"]["function"]
    assert f["description"] == "Add two integers together."
    assert f["parameters"]["properties"]["a"] == {
        "type": "integer",
        "description": "The first number.",
    }
    assert f["parameters"]["properties"]["b"]["default"] == 3
    assert f["parameters"]["required"] == ["a"]


def test_mcp_schema():
    tk = DemoToolkit()
    mcp = {t["name"]: t for t in tk.get_tools_in_mcp()}
    assert "inputSchema" in mcp["shout"]


def test_call_tool():
    tk = DemoToolkit()
    assert asyncio.run(tk.call_tool("add_numbers", {"a": 2})) == "5"
    assert asyncio.run(tk.call_tool("shout", {"text": "hi"})) == "HI"
    with pytest.raises(ValueError):
        asyncio.run(tk.call_tool("missing", {}))


def test_router_routes_and_isolates_errors():
    class Exploding(AsyncBaseToolkit):
        @register_tool
        async def boom(self) -> str:
            """Always fails."""
            raise RuntimeError("kaboom")

    router = ToolRouter([DemoToolkit(), Exploding()])
    assert set(router.tool_names()) == {"add_numbers", "shout", "boom"}
    assert asyncio.run(router.call("add_numbers", {"a": 1, "b": 1})) == "2"
    out = asyncio.run(router.call("boom", {}))
    assert out.startswith("Error calling boom")
    out = asyncio.run(router.call("ghost", {}))
    assert "unknown tool" in out


def test_router_detects_collisions():
    with pytest.raises(ValueError):
        ToolRouter([DemoToolkit(), DemoToolkit()])


def test_docstring_parsing_sections():
    def fn(x: int, y: str = "a") -> str:
        """Do a thing.

        Longer summary line.

        Args:
            x: The x value
                spanning two lines.
            y: The y value.

        Returns:
            A string.
        """

    summary, params = parse_docstring(fn.__doc__)
    assert summary.startswith("Do a thing.")
    assert params["x"] == "The x value spanning two lines."
    schema = function_schema(fn)
    assert schema["function"]["parameters"]["properties"]["y"]["type"] == "string"


def test_schema_complex_types():
    def fn(items: list[str], opts: dict | None = None, mode: str = "fast") -> str:
        """Complex.

        Args:
            items: Some items.
            opts: Options dict.
            mode: The mode.
        """

    props = function_schema(fn)["function"]["parameters"]["properties"]
    assert props["items"] == {"type": "array", "items": {"type": "string"}, "description": "Some items."}
    assert props["opts"]["type"] == "object"
