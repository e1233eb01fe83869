#!/usr/bin/env python
"""DTR Excel-QA quality benchmark (VERDICT r3 item 5).

Reproduces the shape of the reference's 500-question Excel QA table
(/root/reference/README.md:666-743 — accuracy / analysis depth per
system) at committed-fixture scale, deterministically and offline:

  fixtures   two multi-sheet CSV workbooks (benchmarks/data/dtr/),
             40 questions: lookups, filters, aggregations, group-by
             superlatives, cross-sheet joins, chart requests.
  systems    the ExcelAgent's three planners — linear (ref "Fast Mode"),
             mcts (multi-path + reward selection), autonomous (plan-free
             think/code/answer loop, ref smg_autonomous.py) — all driven
             by ONE deterministic scripted analyst (FakeChatClient
             rule_fn) that writes pandas from whatever schema brief the
             harness shows it.
  judge      accuracy: gold values computed directly with pandas must
             appear in the agent's final answer;
             depth: the repo's own reward evaluator
             (integrations/dtr/reward.evaluate_plan) over the executed
             step nodes — the "Analysis Depth" axis;
             cost: LLM calls per question.

Run:  python scripts/bench_dtr.py
Writes benchmarks/data/dtr/ fixtures + benchmarks/dtr_report.json.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

DATA_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks", "data", "dtr",
)

_REGIONS = ["north", "south", "east", "west"]
_PRODUCTS = ["gizmo", "widget", "sprocket", "flange", "bracket", "coupling"]
_CATEGORIES = {"gizmo": "gadgets", "widget": "gadgets", "sprocket": "hardware",
               "flange": "hardware", "bracket": "fixtures", "coupling": "fixtures"}
_SITES = ["Arden", "Blackrock", "Calder", "Dunmore", "Eastgate"]
_COUNTRIES = {"Arden": "Norway", "Blackrock": "Chile", "Calder": "Norway",
              "Dunmore": "Canada", "Eastgate": "Chile"}


def gen_workbooks(rng) -> dict[str, dict[str, pd.DataFrame]]:
    orders = pd.DataFrame({
        "region": [(_REGIONS[int(rng.integers(0, 4))]) for _ in range(120)],
        "product": [(_PRODUCTS[int(rng.integers(0, 6))]) for _ in range(120)],
        "qty": [int(rng.integers(1, 40)) for _ in range(120)],
        "revenue": [int(rng.integers(50, 5000)) for _ in range(120)],
        "quarter": [f"Q{int(rng.integers(1, 5))}" for _ in range(120)],
    })
    products = pd.DataFrame({
        "product": _PRODUCTS,
        "category": [_CATEGORIES[p] for p in _PRODUCTS],
        "unit_cost": [round(float(rng.uniform(2, 120)), 2) for _ in _PRODUCTS],
    })
    staff = pd.DataFrame({
        "rep": [f"rep_{i:02d}" for i in range(12)],
        "region": [_REGIONS[i % 4] for i in range(12)],
        "deals": [int(rng.integers(1, 60)) for _ in range(12)],
    })
    incidents = pd.DataFrame({
        "site": [(_SITES[int(rng.integers(0, 5))]) for _ in range(60)],
        "severity": [["low", "medium", "high"][int(rng.integers(0, 3))] for _ in range(60)],
        "hours_lost": [int(rng.integers(1, 90)) for _ in range(60)],
        "month": [f"2025-{int(rng.integers(1, 13)):02d}" for _ in range(60)],
    })
    sites = pd.DataFrame({
        "site": _SITES,
        "country": [_COUNTRIES[s] for s in _SITES],
        "headcount": [int(rng.integers(40, 900)) for _ in _SITES],
    })
    return {
        "wb_sales": {"orders": orders, "products": products, "staff": staff},
        "wb_ops": {"incidents": incidents, "sites": sites},
    }


def gen_questions(wbs) -> list[dict]:
    """Questions + pandas-computed gold values (never shown to the agent)."""
    sales, ops = wbs["wb_sales"], wbs["wb_ops"]
    orders, products, staff = sales["orders"], sales["products"], sales["staff"]
    incidents, sites = ops["incidents"], ops["sites"]
    qs: list[dict] = []

    def add(wb, question, gold, kind):
        qs.append({"workbook": wb, "question": question,
                   "gold": gold, "kind": kind})

    # lookups (products / sites)
    for p in _PRODUCTS[:4]:
        add("wb_sales", f"What is the unit_cost of product '{p}'?",
            float(products.loc[products["product"] == p, "unit_cost"].iloc[0]),
            "lookup")
    for s in _SITES[:3]:
        add("wb_ops", f"What is the headcount at site '{s}'?",
            int(sites.loc[sites["site"] == s, "headcount"].iloc[0]), "lookup")

    # filtered aggregations
    for r in _REGIONS:
        add("wb_sales", f"What is the total revenue in region '{r}'?",
            int(orders.loc[orders["region"] == r, "revenue"].sum()), "aggregate")
    for sev in ("high", "medium"):
        add("wb_ops", f"What is the total hours_lost for severity '{sev}' incidents?",
            int(incidents.loc[incidents["severity"] == sev, "hours_lost"].sum()),
            "aggregate")
    add("wb_sales", "What is the average qty in region 'north'?",
        round(float(orders.loc[orders["region"] == "north", "qty"].mean()), 2),
        "aggregate")
    for q_ in ("Q1", "Q3"):
        add("wb_sales", f"What is the total revenue in quarter '{q_}'?",
            int(orders.loc[orders["quarter"] == q_, "revenue"].sum()), "aggregate")

    # group-by superlatives
    add("wb_sales", "Which region has the highest total revenue?",
        str(orders.groupby("region")["revenue"].sum().idxmax()), "superlative")
    add("wb_sales", "Which product has the highest total qty?",
        str(orders.groupby("product")["qty"].sum().idxmax()), "superlative")
    add("wb_sales", "Which rep has the highest deals?",
        str(staff.loc[staff["deals"].idxmax(), "rep"]), "superlative")
    add("wb_ops", "Which site has the highest total hours_lost?",
        str(incidents.groupby("site")["hours_lost"].sum().idxmax()), "superlative")

    # cross-sheet joins
    m = orders.merge(products, on="product")
    for c in ("gadgets", "hardware", "fixtures"):
        add("wb_sales", f"What is the total revenue for category '{c}'?",
            int(m.loc[m["category"] == c, "revenue"].sum()), "join")
    mi = incidents.merge(sites, on="site")
    for c in ("Norway", "Chile"):
        add("wb_ops", f"What is the total hours_lost in country '{c}'?",
            int(mi.loc[mi["country"] == c, "hours_lost"].sum()), "join")
    add("wb_sales",
        "Which category has the highest total revenue?",
        str(m.groupby("category")["revenue"].sum().idxmax()), "join")

    # chart requests (judged on the underlying aggregates being produced)
    g = orders.groupby("region")["revenue"].sum()
    add("wb_sales", "Plot total revenue per region as a bar chart.",
        int(g.max()), "chart")
    g2 = incidents.groupby("severity")["hours_lost"].sum()
    add("wb_ops", "Chart the total hours_lost by severity.",
        int(g2.max()), "chart")

    # hard multi-hop questions (two aggregates, ratios, median splits) —
    # the tier that differentiates planners, like the reference's
    # sub-100% Excel-QA rows
    add("wb_sales",
        "What percentage of total revenue comes from region 'north'? "
        "Give one decimal.",
        round(100 * orders.loc[orders["region"] == "north", "revenue"].sum()
              / orders["revenue"].sum(), 1), "hard")
    qrev = orders.groupby("quarter")["revenue"].sum()
    add("wb_sales",
        "Which quarter had the largest increase in total revenue over the "
        "previous quarter?", str(qrev.diff().idxmax()), "hard")
    rev_w = orders.loc[orders["region"] == "west", "revenue"].sum()
    deals_w = staff.loc[staff["region"] == "west", "deals"].sum()
    add("wb_sales",
        "What is the revenue per deal in region 'west' (total revenue "
        "divided by total deals)? Round to 2 decimals.",
        round(float(rev_w) / float(deals_w), 2), "hard")
    med = products["unit_cost"].median()
    expensive = set(products.loc[products["unit_cost"] > med, "product"])
    sub = orders[orders["product"].isin(expensive)]
    add("wb_sales",
        "Among products with unit_cost above the median, which has the "
        "highest total qty?",
        str(sub.groupby("product")["qty"].sum().idxmax()), "hard")
    mh = incidents.merge(sites, on="site")
    per_head = (mh.groupby("country")["hours_lost"].sum()
                / sites.groupby("country")["headcount"].sum())
    add("wb_ops",
        "Which country has the highest total hours_lost per unit of "
        "headcount?", str(per_head.idxmax()), "hard")
    share = incidents.loc[incidents["severity"] == "high", "hours_lost"].sum()
    add("wb_ops",
        "What percentage of all hours_lost comes from high-severity "
        "incidents? Give one decimal.",
        round(100 * share / incidents["hours_lost"].sum(), 1), "hard")
    return qs


# ------------------------------------------------------------------ scripted analyst

_STOP = {"the", "a", "an", "of", "for", "in", "on", "at", "is", "are", "what",
         "which", "has", "have", "with", "to", "was", "by", "per", "as",
         "does", "did", "total", "average", "highest", "most", "plot", "chart",
         "bar", "incidents", "items"}

_SYN = {"revenue": ["revenue"], "qty": ["qty", "quantity"], "cost": ["cost"],
        "hours": ["hours", "lost"], "deals": ["deals"], "headcount": ["headcount"]}


def _words(text: str) -> list[str]:
    return [w for w in re.findall(r"[a-z0-9_]+", text.lower()) if w not in _STOP]


class ScriptedAnalyst:
    """Deterministic pandas author for the ExcelAgent prompt protocol.

    Like the text2sql scripted author: it writes analysis code from ONLY
    the schema brief in the prompt plus the question — never from the
    fixture generators or gold values."""

    def parse_brief(self, prompt: str) -> dict[str, dict[str, dict]]:
        sheets: dict[str, dict[str, dict]] = {}
        cur = None
        for line in prompt.splitlines():
            m = re.match(r"- (\w+): \d+ rows x \d+ cols", line)
            if m:
                cur = m.group(1)
                sheets[cur] = {}
                continue
            m = re.match(r"\s+columns: (.+)$", line)
            if m and cur:
                for cm in re.finditer(r"(\w+) \(([^)]*)\)", m.group(1)):
                    inner = cm.group(2)
                    semantic = inner.split(";")[0].strip()
                    vals = []
                    vm = re.search(r"values: (.+)$", inner)
                    if vm:
                        vals = [v.strip() for v in vm.group(1).split(",") if v.strip()]
                    sheets[cur][cm.group(1)] = {"semantic": semantic, "values": vals}
        return sheets

    def _bind_literal(self, sheets, lit: str) -> tuple[str, str] | None:
        for sheet, cols in sheets.items():
            for col, info in cols.items():
                if lit in info["values"]:
                    return sheet, col
        # month/quarter style literals may not be in top-values; bind by
        # shape to a categorical column whose values share a prefix
        for sheet, cols in sheets.items():
            for col, info in cols.items():
                if info["semantic"] == "categorical" and any(
                    v[:1] == lit[:1] for v in info["values"]
                ):
                    return sheet, col
        return None

    def _measure(self, sheets, words, exclude=()) -> tuple[str, str] | None:
        expanded = set(words)
        for w in words:
            expanded.update(_SYN.get(w, ()))
            expanded.update(w.split("_"))  # unit_cost asks match unit_cost cols
        best, score = None, 0
        for sheet, cols in sheets.items():
            for col, info in cols.items():
                if col in exclude or info["semantic"] != "numeric":
                    continue
                s = len(set(col.lower().split("_")) & expanded)
                if s > score:
                    best, score = (sheet, col), s
        return best

    @staticmethod
    def _join_code(sheets, a: str, b: str) -> tuple[str, str]:
        """merge expression + result frame name over the shared column."""
        common = set(sheets[a]) & set(sheets[b])
        key = sorted(common)[0] if common else None
        expr = (
            f"m = dfs['{a}'].merge(dfs['{b}'], on='{key}')"
            if key else f"m = dfs['{a}']"
        )
        return expr, "m"

    def author(self, question: str, prompt: str) -> str:
        sheets = self.parse_brief(prompt)
        if not sheets:
            return "print('no schema visible')"
        ql = question.lower()
        words = _words(question)
        lits = re.findall(r"'([^']+)'", question)

        where = None
        for lit in lits:
            bound = self._bind_literal(sheets, lit)
            if bound:
                where = (bound[0], bound[1], lit)
                break

        agg = "sum" if re.search(r"\btotal\b", ql) else (
            "mean" if re.search(r"\baverage\b", ql) else None)
        superlative = re.search(r"(?:which|what) (\w+) has the (?:highest|most|largest)", ql)
        chart = re.search(r"\b(plot|chart|graph)\b", ql)

        if superlative and not chart:
            group_col = superlative.group(1)
            # locate the grouping column and the measure
            gloc = next(((s, c) for s, cols in sheets.items() for c in cols
                         if c == group_col or group_col in c), None)
            meas = self._measure(sheets, words, exclude=(group_col,))
            if gloc and meas:
                gs, gc = gloc
                ms, mc = meas
                if gs == ms:
                    return (f"g = dfs['{gs}'].groupby('{gc}')['{mc}'].sum()\n"
                            "print(g.idxmax(), g.max())")
                expr, frame = self._join_code(sheets, ms, gs)
                return (f"{expr}\n"
                        f"g = {frame}.groupby('{gc}')['{mc}'].sum()\n"
                        "print(g.idxmax(), g.max())")
            if gloc:  # direct row max (e.g. which rep has the highest deals)
                gs, gc = gloc
                meas2 = self._measure(sheets, words)
                if meas2 and meas2[0] == gs:
                    return (f"r = dfs['{gs}'].loc[dfs['{gs}']['{meas2[1]}'].idxmax()]\n"
                            "print(r.to_dict())")
            return "print('cannot identify grouping')"

        if chart:
            # group the measure by the named dimension and print the data
            # (offline chart: values + a spec line, no display backend)
            meas = self._measure(sheets, words)
            dim = None
            m = re.search(r"(?:per|by) (\w+)", ql)
            if m:
                dim = m.group(1)
            if meas and dim:
                s, c = meas
                gc = next((col for col in sheets[s] if dim in col), None)
                if gc:
                    return (f"g = dfs['{s}'].groupby('{gc}')['{c}'].sum()\n"
                            "print(g.to_dict())\n"
                            f"print('bar chart: {gc} vs {c}')")
            return "print('cannot chart')"

        if agg:
            meas = self._measure(sheets, words)
            if meas is None:
                return "print('no measure found')"
            ms, mc = meas
            if where is None:
                return f"print(dfs['{ms}']['{mc}'].{agg}())"
            ws, wc, lit = where
            if ws == ms:
                return (f"sel = dfs['{ms}'][dfs['{ms}']['{wc}'] == '{lit}']\n"
                        f"print(round(sel['{mc}'].{agg}(), 2))")
            expr, frame = self._join_code(sheets, ms, ws)
            return (f"{expr}\n"
                    f"sel = {frame}[{frame}['{wc}'] == '{lit}']\n"
                    f"print(round(sel['{mc}'].{agg}(), 2))")

        # lookup: what is the <col> of/at <entity>
        if where is not None:
            ws, wc, lit = where
            target = self._measure(sheets, words) or (None, None)
            if target[0] and target[0] != ws:
                # the asked-for column lives in another sheet: rebind the
                # literal there if its values match, else join the sheets
                ts = target[0]
                rebound = next(
                    (c for c, info in sheets[ts].items() if lit in info["values"]),
                    None,
                )
                if rebound:
                    ws, wc = ts, rebound
                else:
                    expr, frame = self._join_code(sheets, ts, ws)
                    return (f"{expr}\n"
                            f"sel = {frame}[{frame}['{wc}'] == '{lit}']\n"
                            f"print(sel['{target[1]}'].iloc[0])")
            if target[0] == ws and target[1]:
                return (f"sel = dfs['{ws}'][dfs['{ws}']['{wc}'] == '{lit}']\n"
                        f"print(sel['{target[1]}'].iloc[0])")
            # print the whole matching row
            return f"print(dfs['{ws}'][dfs['{ws}']['{wc}'] == '{lit}'].to_dict('records'))"
        return "print('unhandled question')"


def make_rule_fn(analyst: ScriptedAnalyst, state: dict):
    from youtu_rag_tpu.agents.llm import FakeChatClient

    def rule(messages, tools):
        content = (messages[-1].content or "") if messages else ""
        if content.startswith("You are a data analyst planning") or \
                content.startswith("The previous analysis of this question failed") or \
                content.startswith("Improve this spreadsheet analysis plan"):
            return FakeChatClient.text_response(json.dumps([state["question"]]))
        if content.startswith("Write pandas code"):
            return FakeChatClient.text_response(analyst.author(state["question"], content))
        if content.startswith("Understand this analysis step"):
            return FakeChatClient.text_response(json.dumps(
                {"goal": state["question"], "input_frames": [], "columns": [],
                 "approach": "scripted"}))
        if content.startswith("Did this step execution succeed"):
            ok = "Error" not in content and "Traceback" not in content
            return FakeChatClient.text_response(json.dumps({"success": ok, "reason": "scripted"}))
        if content.startswith("Reflect on why"):
            return FakeChatClient.text_response(
                "```python\n" + analyst.author(state["question"], content) + "\n```")
        if content.startswith("You are reviewing"):
            # batch reward verdicts: one JSON list judged from outputs
            n = int(re.search(r"reviewing (\d+)", content).group(1))
            return FakeChatClient.text_response(json.dumps(
                [{"success": True, "reason": "scripted"} for _ in range(n)]))
        if content.startswith("# Autonomous tabular analysis"):
            turn = state.get("auto_turns", 0)
            state["auto_turns"] = turn + 1
            if turn == 0:
                return FakeChatClient.text_response(
                    "[CODE]\n" + analyst.author(state["question"], content))
            hist = content.split("History of your previous turns:")[-1]
            hist = hist.split("Output EXACTLY ONE action tag")[0]
            vals = [ln.strip() for ln in hist.splitlines()
                    if ln.strip() and not ln.strip().startswith(("[", "#", "("))]
            return FakeChatClient.text_response(
                "[Final Answer]\n" + (" ; ".join(vals[-4:]) or "no result"))
        if content.startswith("Answer the question") or "analysis results" in content[:80]:
            # scripted answer: quote the evidence block's output lines —
            # the printed results carry the values the judge checks for
            m = re.search(
                r"Analysis evidence[^\n]*\n(.*?)(?:\n\nFrames|\n\nWrite|\nThis is a |\Z)",
                content, re.S,
            )
            evidence = (m.group(1) if m else content).strip()
            # quote each step's printed output (the lines following every
            # "[step N]" header) — that's where the computed values live
            outs, lines = [], evidence.splitlines()
            for i, ln in enumerate(lines):
                if ln.startswith("[step "):
                    buf = []
                    for l2 in lines[i + 1:]:
                        if (l2.startswith("[step ") or not l2.strip()
                                or l2.startswith("Final result table")):
                            break
                        buf.append(l2.strip())
                    outs.append(" ".join(buf))
            answer = " ; ".join(o for o in outs if o) or evidence
            return FakeChatClient.text_response(answer[:400])
        return FakeChatClient.text_response("?")

    return rule


# ------------------------------------------------------------------ judge

def gold_matches(gold, answer: str) -> bool:
    a = answer.lower()
    if isinstance(gold, str):
        return gold.lower() in a
    # numeric: accept int and 2-decimal float spellings
    forms = {f"{gold}", f"{gold:.1f}", f"{gold:.2f}", f"{float(gold)}"}
    if float(gold) == int(gold):
        forms.add(str(int(gold)))
    return any(f in a for f in forms)


async def run_planner(planner: str, questions, wb_dirs, eval_mode: str = "step") -> dict:
    from youtu_rag_tpu.agents.llm import FakeChatClient
    from youtu_rag_tpu.integrations.dtr.excel_agent import ExcelAgent
    from youtu_rag_tpu.integrations.dtr.reward import evaluate_plan

    analyst = ScriptedAnalyst()
    ok = 0
    by_kind: dict[str, list[int]] = {}
    depth, calls = [], []
    for q in questions:
        state = {"question": q["question"]}
        agent = ExcelAgent(
            client=FakeChatClient(rule_fn=make_rule_fn(analyst, state)),
            planner=planner,
            mcts_iterations=2,
            eval_mode=eval_mode,
            max_steps=4,
        )
        try:
            rec = await agent.run(q["question"], wb_dirs[q["workbook"]])
            answer = rec.final_output or ""
        except Exception as e:  # noqa: BLE001 - a crash is a wrong answer
            answer = f"error: {e}"
        hit = gold_matches(q["gold"], answer)
        ok += hit
        by_kind.setdefault(q["kind"], []).append(int(hit))
        if agent.last_smg is not None and agent.last_smg.nodes:
            depth.append(evaluate_plan(agent.last_smg.nodes, q["question"]))
        calls.append(agent.llm_calls)
    n = len(questions)
    return {
        "planner": planner,
        "accuracy": round(ok / n, 4),
        "depth_reward": round(sum(depth) / max(len(depth), 1), 4),
        "llm_calls_per_q": round(sum(calls) / n, 2),
        "by_kind": {k: round(sum(v) / len(v), 3) for k, v in sorted(by_kind.items())},
    }


def write_fixtures(wbs) -> dict[str, str]:
    dirs = {}
    for wb, sheets in wbs.items():
        d = os.path.join(DATA_DIR, wb)
        os.makedirs(d, exist_ok=True)
        for name, df in sheets.items():
            df.to_csv(os.path.join(d, f"{name}.csv"), index=False)
        dirs[wb] = d
    return dirs


async def main_async(args) -> dict:
    rng = np.random.default_rng(23)
    wbs = gen_workbooks(rng)
    wb_dirs = write_fixtures(wbs)
    questions = gen_questions(wbs)
    with open(os.path.join(DATA_DIR, "questions.json"), "w") as f:
        json.dump(questions, f, ensure_ascii=False, indent=1, default=str)
    report = {"questions": len(questions), "systems": []}
    for planner in ("linear", "mcts", "autonomous"):
        print(f"planner {planner} ...", file=sys.stderr, flush=True)
        report["systems"].append(await run_planner(planner, questions, wb_dirs))
    # the batch reward evaluator variant (1 LLM eval per plan)
    report["systems"].append(
        {**(await run_planner("linear", questions, wb_dirs, eval_mode="batch")),
         "planner": "linear+batch_reward"}
    )
    return report


def main() -> None:
    p = argparse.ArgumentParser()
    args = p.parse_args()
    report = asyncio.run(main_async(args))
    print(json.dumps(report))
    out = os.path.join(os.path.dirname(os.path.dirname(DATA_DIR)), "dtr_report.json")
    with open(out, "w") as f:
        f.write(json.dumps(report, indent=1) + "\n")
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
