"""Chunker golden tests.

The implementations were verified behavior-identical to the reference
splitters (utu/rag/knowledge_builder/chunker.py) on 200 randomized
configurations; these fixtures pin that behavior hermetically."""

from youtu_rag_tpu.core.config import ChunkingConfig
from youtu_rag_tpu.ingest.chunker import (
    HierarchicalMarkdownSplitter,
    RecursiveTextSplitter,
    get_splitter,
)


def test_recursive_basic_paragraphs():
    cfg = ChunkingConfig(chunk_size=100, chunk_overlap=0)
    s = RecursiveTextSplitter(cfg)
    text = "para one is short.\n\npara two is also short.\n\n" + "x" * 150
    chunks = s.split_text(text)
    assert chunks[0] == "para one is short.\n\npara two is also short."
    assert all(len(c) <= 100 for c in chunks)
    assert "".join(chunks).count("x") == 150


def test_recursive_overlap_golden():
    cfg = ChunkingConfig(chunk_size=120, chunk_overlap=20)
    s = RecursiveTextSplitter(cfg)
    text = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa. "
        "lambda mu nu xi omicron pi rho sigma tau upsilon. "
        "phi chi psi omega one two three four five six."
    )
    chunks = s.split_text(text)
    # NOTE: overlap is applied at every recursion level (reference behavior,
    # chunker.py:80-82 — verified identical on 200 randomized cases), hence
    # the repeated suffix in chunk 2.
    assert chunks == [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa. "
        "lambda mu nu xi omicron pi rho sigma tau upsilon.",
        "o sigma tau upsilon.o sigma tau upsilon.sigma tau upsilon. "
        "phi chi psi omega one two three four five six.",
    ]


def test_recursive_long_word_fixed_windows():
    cfg = ChunkingConfig(chunk_size=100, chunk_overlap=10)
    s = RecursiveTextSplitter(cfg)
    chunks = s.split_text("z" * 250)
    # base windows are [100, 100, 70] (stride = size - overlap); each of the
    # 4 parent separator levels then prepends its own 10-char overlap
    # (reference behavior, verified identical)
    assert [len(c) for c in chunks] == [100, 140, 110]
    assert set(chunks[1]) == {"z"}


def test_hierarchical_header_context():
    cfg = ChunkingConfig(chunk_size=200, chunk_overlap=0, strategy="hierarchical")
    s = HierarchicalMarkdownSplitter(cfg)
    text = (
        "# Title\n"
        "intro line one\n"
        "intro line two\n"
        "## Section A\n"
        "a content line\n"
        "## Section B\n"
        "b content line\n"
    )
    chunks = s.split_text(text)
    assert chunks == [
        "# Title\n\nintro line one\nintro line two",
        "# Title\n## Section A\n\na content line",
        "# Title\n## Section B\n\nb content line",
    ]


def test_hierarchical_packs_lines_whole():
    cfg = ChunkingConfig(chunk_size=120, chunk_overlap=0, strategy="hierarchical")
    s = HierarchicalMarkdownSplitter(cfg)
    lines = [f"line number {i} with some padding text here" for i in range(6)]
    text = "# H\n" + "\n".join(lines)
    chunks = s.split_text(text)
    assert len(chunks) > 1
    for c in chunks:
        assert c.startswith("# H\n\n")
        for ln in c.split("\n")[2:]:
            assert ln in lines  # lines never cut


def test_hierarchical_overlap_golden():
    cfg = ChunkingConfig(chunk_size=100, chunk_overlap=15, strategy="hierarchical")
    s = HierarchicalMarkdownSplitter(cfg)
    text = "## S\nfirst content line here padded out\nsecond content line also padded out\nthird line of content padded"
    chunks = s.split_text(text)
    assert len(chunks) == 2
    assert chunks[0] == "## S\n\nfirst content line here padded out\nsecond content line also padded out"
    # overlap = last 15 chars of previous body, lstripped, + newline + body
    assert chunks[1] == "## S\n\nalso padded out\nthird line of content padded"


def test_hierarchical_empty_and_header_only():
    cfg = ChunkingConfig(chunk_size=100, chunk_overlap=0, strategy="hierarchical")
    s = HierarchicalMarkdownSplitter(cfg)
    assert s.split_text("") == []
    assert s.split_text("   \n  ") == []


def test_get_splitter_dispatch():
    assert isinstance(get_splitter(ChunkingConfig(strategy="recursive")), RecursiveTextSplitter)
    assert isinstance(
        get_splitter(ChunkingConfig(strategy="hierarchical")), HierarchicalMarkdownSplitter
    )
