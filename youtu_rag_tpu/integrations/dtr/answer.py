"""Answer generation for DTR runs.

Capability counterpart of the reference's answer generator
(``integrations/DTR/src/modules/answer_generator.py``, 1,440 LoC): the
final synthesis stage that turns the SMG's executed steps into an answer
with evidence — per-step citations, the concrete numbers/tables produced,
and a state trace of the frames involved. An LLM writes the prose when
one is configured; the deterministic path composes the answer from the
last successful step's output (the hermetic surface the reference lacks)."""

from __future__ import annotations

from typing import Any

from .smg import SMGNode

ANSWER_PROMPT = """Answer the question from the analysis results.

Question: {question}

Analysis evidence (cite steps as [step N] where used):
{evidence}

Frames produced: {frames}

Write the final answer:
- lead with the direct answer and its concrete numbers,
- cite the supporting steps like [step 2],
- include a small markdown table when the result is tabular,
- note any step that failed and how it limits confidence."""


def build_evidence(nodes: list[SMGNode]) -> str:
    """Per-step evidence block: description, outcome, trimmed output, and
    the frame-state delta (what each step created/changed)."""
    parts = []
    for i, n in enumerate(nodes, start=1):
        delta = ""
        if n.new_frames:
            delta += f" | new frames: {', '.join(n.new_frames)}"
        if n.changed_frames:
            delta += f" | changed: {', '.join(n.changed_frames)}"
        parts.append(
            f"[step {i}] {n.description} ({'ok' if n.success else 'FAILED'}{delta})\n"
            f"{(n.output or '').strip()[:600]}"
        )
    return "\n\n".join(parts) or "(no steps executed)"


def fallback_answer(question: str, nodes: list[SMGNode]) -> str:
    """Deterministic synthesis when no LLM is configured: the last
    successful step's output is the answer, with a citation trail."""
    ok = [(i, n) for i, n in enumerate(nodes, start=1) if n.success and n.output.strip()]
    if not ok:
        failures = "; ".join(f"[step {i}] {n.description}" for i, n in enumerate(nodes, start=1))
        return f"Analysis did not produce a result. Failed steps: {failures or 'none executed'}"
    i, last = ok[-1]
    cites = ", ".join(f"[step {j}]" for j, _ in ok)
    return f"{last.output.strip()[:1200]}\n\n(evidence: {cites}; answering step: [step {i}])"


async def synthesize_answer(question: str, nodes: list[SMGNode], llm_chat, state: dict[str, Any] | None = None) -> str:
    """LLM synthesis with the evidence block; deterministic fallback when
    ``llm_chat`` is None or fails."""
    if llm_chat is None:
        return fallback_answer(question, nodes)
    frames = ", ".join(f"{k} ({v.summary()})" for k, v in (state or {}).items()) or "(none)"
    try:
        out = await llm_chat(
            ANSWER_PROMPT.format(question=question, evidence=build_evidence(nodes), frames=frames)
        )
        return out or fallback_answer(question, nodes)
    except Exception:  # noqa: BLE001 - answer must always come back
        return fallback_answer(question, nodes)
