"""FileEditToolkit tests (ref surface: utu/tools/file_edit_toolkit.py)."""

import asyncio

import pytest

from youtu_rag_tpu.tools import get_toolkit


def _run(coro):
    return asyncio.run(coro)


@pytest.fixture
def tk(tmp_path):
    return get_toolkit("file_edit", {"workspace_root": str(tmp_path), "backup_enabled": True})


def test_write_read_roundtrip(tk):
    _run(tk.write_file("notes.md", "hello\nworld\n"))
    assert _run(tk.read_file("notes.md")) == "hello\nworld\n"


def test_edit_applies_search_replace_blocks(tk, tmp_path):
    _run(tk.write_file("a.py", "x = 1\ny = 2\n"))
    diff = (
        "<<<<<<< SEARCH\nx = 1\n=======\nx = 42\n>>>>>>> REPLACE\n"
        "<<<<<<< SEARCH\nmissing\n=======\nnope\n>>>>>>> REPLACE"
    )
    msg = _run(tk.edit_file("a.py", diff))
    assert "1/2" in msg and "missing" in msg
    assert _run(tk.read_file("a.py")) == "x = 42\ny = 2\n"
    # backup_enabled: the pre-edit copy exists (write + edit = 1 backup each
    # for existing files; write of a new file makes none)
    assert list(tmp_path.glob("a.py.*.bak"))


def test_edit_rejects_diff_without_blocks(tk):
    _run(tk.write_file("b.txt", "abc"))
    assert _run(tk.edit_file("b.txt", "not a diff")).startswith("Error")


def test_path_escape_raises(tk):
    with pytest.raises(ValueError):
        _run(tk.read_file("../outside.txt"))
    with pytest.raises(ValueError):
        _run(tk.write_file("/etc/passwd", "x"))


def test_filename_sanitized(tk, tmp_path):
    _run(tk.write_file("we ird$name.txt", "ok"))
    assert (tmp_path / "we_ird_name.txt").exists()


def test_list_files_and_schema(tk):
    _run(tk.write_file("sub/c.txt", "x"))
    listing = _run(tk.list_files())
    assert "sub/" in listing
    names = {s["function"]["name"] for s in tk.get_tools_in_openai()}
    assert {"read_file", "write_file", "edit_file", "list_files"} <= names
