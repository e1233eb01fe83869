"""SMG sheet-state machine tests (VERDICT r1 #3): cross-step frame
persistence (joins), state tracking, prefix caching, schema linking,
answer synthesis."""

import asyncio
import json

import pandas as pd
import pytest

from youtu_rag_tpu.agents.llm import FakeChatClient
from youtu_rag_tpu.integrations.dtr.answer import build_evidence, fallback_answer
from youtu_rag_tpu.integrations.dtr.excel_agent import ExcelAgent
from youtu_rag_tpu.integrations.dtr.smg import SheetStateMachine, SMGNode, link_sheets


@pytest.fixture
def orders_workbook(tmp_path):
    """Two CSVs can't be one workbook; use a 2-sheet xlsx-equivalent via
    one CSV + join encoded in dfs? No — multi-sheet needs xlsx. openpyxl
    is unavailable, so emulate multi-sheet with a combined CSV the loader
    splits? Instead: exercise multi-frame state with DERIVED frames —
    step 1 builds two frames from one sheet and merges them; step 2 can
    only succeed if step 1's `merged` frame survives."""
    df = pd.DataFrame(
        {
            "order_id": [1, 2, 3, 4, 5, 6],
            "customer": ["ann", "bob", "ann", "cat", "bob", "ann"],
            "amount": [10, 20, 30, 40, 50, 60],
            "region_of_customer": ["west", "east", "west", "north", "east", "west"],
        }
    )
    p = tmp_path / "orders.csv"
    df.to_csv(p, index=False)
    return str(p)


def test_join_across_steps_needs_state_machine(orders_workbook):
    """Step 2 references the frame step 1 created. Without the SMG's
    accumulated execution this fails (fresh namespace per step — the r1
    linear executor's behavior); with it the join result flows through."""
    plan = [
        "build customer totals and region lookup, merge into `merged`",
        "from merged, find the region with the highest total amount",
    ]
    step_code = {
        1: (
            "totals = dfs['Sheet1'].groupby('customer')['amount'].sum().reset_index()\n"
            "regions = dfs['Sheet1'][['customer','region_of_customer']].drop_duplicates()\n"
            "merged = totals.merge(regions, on='customer')\n"
            "print(merged.shape)"
        ),
        # deliberately references ONLY `merged` — no recomputation
        2: (
            "best = merged.groupby('region_of_customer')['amount'].sum().idxmax()\n"
            "print('best region:', best)"
        ),
    }
    calls = {"n": 0}

    def rule(messages, tools):
        content = messages[-1].content or ""
        if content.startswith("You are a data analyst planning"):
            return FakeChatClient.text_response(json.dumps(plan))
        if content.startswith("Write pandas code"):
            calls["n"] += 1
            # the state feedback must advertise the live frame to step 2
            if "find the region" in content:
                assert "merged" in content, "state summary must expose the derived frame"
                return FakeChatClient.text_response(step_code[2])
            return FakeChatClient.text_response(step_code[1])
        if content.startswith("Did this step execution succeed"):
            ok = "Error" not in content
            return FakeChatClient.text_response(json.dumps({"success": ok, "reason": ""}))
        if content.startswith("Answer the question"):
            m = "west" if "west" in content else "?"
            return FakeChatClient.text_response(f"The top region is {m} [step 2].")
        return FakeChatClient.text_response("?")

    agent = ExcelAgent(client=FakeChatClient(rule_fn=rule))
    rec = asyncio.run(agent.run("which region generates the most revenue?", orders_workbook))
    assert "west" in rec.final_output


def test_state_machine_tracks_frames(orders_workbook):
    smg = SheetStateMachine(orders_workbook)

    async def go():
        out1, st1 = await smg.execute_step(
            "merged = dfs['Sheet1'].groupby('customer')['amount'].sum().reset_index()\nprint(len(merged))"
        )
        node1 = SMGNode("aggregate", code=(
            "merged = dfs['Sheet1'].groupby('customer')['amount'].sum().reset_index()\nprint(len(merged))"
        ), output=out1, success=True)
        smg.record(node1, st1)
        out2, st2 = await smg.execute_step("print(merged['amount'].max())")
        return node1, st1, out2

    node1, st1, out2 = asyncio.run(go())
    assert "merged" in st1 and st1["merged"].shape == (3, 2)
    assert "dfs['Sheet1']" in st1  # source sheets tracked too
    assert "merged" in node1.new_frames
    assert out2.strip() == "100"  # ann: 10+30+60
    assert "merged" in smg.state_summary()
    assert smg.memory_summary()["steps"] == 1


def test_prefix_cache_skips_reexecution(orders_workbook):
    smg = SheetStateMachine(orders_workbook)

    async def run_once():
        out, st = await smg.execute_step("x1 = dfs['Sheet1'].head(3)\nprint('step one ran')")
        n = SMGNode("take top rows", code="x1 = dfs['Sheet1'].head(3)\nprint('step one ran')",
                    output=out, success=True)
        smg.record(n, st)
        smg.cache_prefix(["take top rows"], [n])
        return n

    n = asyncio.run(run_once())
    cached = smg.cached_prefix(["take top rows", "count them"])
    assert cached == [n]
    assert smg.cached_prefix(["different step"]) == []
    # failed nodes never come back from the cache
    bad = SMGNode("broken", success=False)
    smg.cache_prefix(["broken"], [bad])
    assert smg.cached_prefix(["broken"]) == []


def test_smg_error_reported(orders_workbook):
    smg = SheetStateMachine(orders_workbook)
    out, st = asyncio.run(smg.execute_step("print(nope)"))
    assert "Error" in out and "nope" in out


def test_link_sheets_ranks_by_relevance():
    sheets = {
        "employees": pd.DataFrame({"name": ["a"], "salary": [1], "department": ["x"]}),
        "inventory": pd.DataFrame({"sku": ["s"], "stock": [3]}),
        "sales": pd.DataFrame({"region": ["w"], "revenue": [9], "salary_cost": [2]}),
    }
    ranked = link_sheets("what is the average salary per department?", sheets, top_n=2)
    assert ranked[0][0] == "employees"
    assert "salary" in ranked[0][2] and "department" in ranked[0][2]


def test_answer_fallback_without_llm():
    nodes = [
        SMGNode("step a", output="intermediate", success=True),
        SMGNode("step b", output="final: 42", success=True),
    ]
    ans = fallback_answer("q", nodes)
    assert "final: 42" in ans and "[step 2]" in ans
    ev = build_evidence(nodes)
    assert "[step 1]" in ev and "[step 2]" in ev
    # all-failed case reports the failures instead of hallucinating
    bad = fallback_answer("q", [SMGNode("broken", success=False)])
    assert "did not produce" in bad and "broken" in bad


def test_staged_code_generation_understand_reflect(orders_workbook):
    """Multi-stage code gen (ref: smg_module enable_multi_stage,
    _stage1/2/3): understand → align-validate → generate; a failed step
    routes through the reflect pass."""
    stages = []

    def rule(messages, tools):
        content = messages[-1].content or ""
        if content.startswith("You are a data analyst planning"):
            return FakeChatClient.text_response('["sum the amount column"]')
        if content.startswith("Understand this analysis step"):
            stages.append("understand")
            return FakeChatClient.text_response(json.dumps(
                {"goal": "total", "input_frames": ["ghost_frame"],
                 "columns": ["amount", "no_such_col"], "approach": "sum"}))
        if content.startswith("Write pandas code"):
            stages.append("generate")
            # the alignment validator must flag the bogus frame/column
            assert "ALIGNMENT WARNINGS" in content
            assert "ghost_frame" in content and "no_such_col" in content
            return FakeChatClient.text_response("print(broken_name)")  # fails
        if content.startswith("Reflect on why this analysis code failed"):
            stages.append("reflect")
            assert "broken_name" in content
            return FakeChatClient.text_response(
                "The variable did not exist.\n```python\nprint(dfs['Sheet1']['amount'].sum())\n```")
        if content.startswith("Did this step execution succeed"):
            ok = "Error" not in content
            return FakeChatClient.text_response(json.dumps({"success": ok, "reason": "nameerror"}))
        if content.startswith("Answer the question"):
            return FakeChatClient.text_response("Total is 210 [step 1].")
        return FakeChatClient.text_response("?")

    agent = ExcelAgent(client=FakeChatClient(rule_fn=rule), code_mode="staged")
    rec = asyncio.run(agent.run("what is the total amount?", orders_workbook))
    assert "210" in rec.final_output
    assert stages == ["understand", "generate", "reflect"]


def test_autonomous_loop(orders_workbook):
    """Plan-free [THINK]/[CODE]/[Final Answer] loop (ref: smg_autonomous):
    the model thinks, runs state-persisting code twice (second turn reuses
    the first turn's frame), then answers."""
    turn = {"n": 0}

    def rule(messages, tools):
        content = messages[-1].content or ""
        if not content.startswith("# Autonomous tabular analysis"):
            return FakeChatClient.text_response("?")
        turn["n"] += 1
        if turn["n"] == 1:
            return FakeChatClient.text_response(
                "[THINK]\nI should aggregate amounts per customer first.")
        if turn["n"] == 2:
            return FakeChatClient.text_response(
                "[CODE]\n```python\ntotals = dfs['Sheet1'].groupby('customer')"
                "['amount'].sum().reset_index()\nprint(len(totals))\n```")
        if turn["n"] == 3:
            # the live-state section must advertise `totals` from turn 2
            assert "totals" in content
            return FakeChatClient.text_response(
                "[CODE]\n```python\nbest = totals.sort_values('amount').iloc[-1]\n"
                "print(best['customer'], int(best['amount']))\n```")
        assert "ann 100" in content  # turn-3 output visible in history
        return FakeChatClient.text_response(
            "[Final Answer]\n## Result\nann leads with **100** (turns 2-3).")

    agent = ExcelAgent(client=FakeChatClient(rule_fn=rule), planner="autonomous")
    rec = asyncio.run(agent.run("which customer spent the most?", orders_workbook))
    assert "ann" in rec.final_output and "100" in rec.final_output
    assert turn["n"] == 4


def test_autonomous_budget_forces_synthesis(orders_workbook):
    """The loop closes itself after max_iters via the answer generator."""

    def rule(messages, tools):
        content = messages[-1].content or ""
        if content.startswith("# Autonomous tabular analysis"):
            return FakeChatClient.text_response("[THINK]\nstill thinking…")
        if content.startswith("Answer the question"):
            return FakeChatClient.text_response("No result was computed.")
        return FakeChatClient.text_response("?")

    agent = ExcelAgent(client=FakeChatClient(rule_fn=rule), planner="autonomous")
    rec = asyncio.run(agent.run("question?", orders_workbook))
    assert rec.final_output  # synthesized despite never reaching an answer


def test_validate_code_structure_gate():
    """Pre-exec gate (ref smg_module._validate_code_structure:1611)."""
    from youtu_rag_tpu.integrations.dtr.smg import validate_code_structure

    ok, _ = validate_code_structure("x = dfs['Sheet1'].head()\nprint(x)")
    assert ok
    for bad, frag in [
        ("", "empty"),
        ("def broken(:", "syntax"),
        ("import subprocess\nsubprocess.run(['ls'])", "forbidden"),
        ("os.system('rm -rf /')", "forbidden"),
        ("eval('1+1')", "forbidden"),
    ]:
        ok, reason = validate_code_structure(bad)
        assert not ok and frag in reason, (bad, reason)


def test_execute_step_rejects_broken_code(tmp_path):
    import asyncio

    import pandas as pd

    from youtu_rag_tpu.integrations.dtr.smg import SheetStateMachine

    p = tmp_path / "t.csv"
    pd.DataFrame({"a": [1]}).to_csv(p, index=False)
    smg = SheetStateMachine(str(p))
    out, state = asyncio.run(smg.execute_step("print(1 +"))
    assert out.startswith("Error: rejected before execution") and state == {}


def test_mcts_parallel_rollouts_run_concurrently():
    """parallel=3 overlaps rollouts (virtual loss keeps selections
    distinct) and still returns the best plan."""
    import asyncio

    from youtu_rag_tpu.integrations.dtr.mcts_planner import MCTSPlanner

    active = {"now": 0, "max": 0}
    rewards = {"a": 0.3, "b": 0.9, "c": 0.5}

    async def propose(parent, feedback):
        return parent + ["refined"]

    async def rollout(plan):
        active["now"] += 1
        active["max"] = max(active["max"], active["now"])
        await asyncio.sleep(0.05)
        active["now"] -= 1
        return rewards.get(plan[0], 0.1), list(plan)

    planner = MCTSPlanner(propose, rollout, iterations=3, parallel=3, early_stop=2.0)
    best = asyncio.run(planner.search([["a"], ["b"], ["c"]]))
    assert best.plan == ["b"] and best.reward == 0.9
    assert active["max"] >= 2, "rollouts never overlapped"


def test_mcts_parallel_matches_serial_best():
    import asyncio

    from youtu_rag_tpu.integrations.dtr.mcts_planner import MCTSPlanner

    async def propose(parent, feedback):
        return parent + ["x"]

    async def rollout(plan):
        return 0.1 * len(plan), list(plan)

    serial = asyncio.run(
        MCTSPlanner(propose, rollout, iterations=4, parallel=1, early_stop=2.0).search([["s"]])
    )
    par = asyncio.run(
        MCTSPlanner(propose, rollout, iterations=4, parallel=2, early_stop=2.0).search([["s"]])
    )
    # both explore refinements and the parallel run is not worse
    assert (par.reward or 0) >= (serial.reward or 0) - 1e-9


def test_smg_loader_handles_tsv_and_directories(tmp_path):
    """The sandbox loader accepts the same formats load_sheets does
    (review finding: .tsv fell through to pd.read_excel)."""
    import asyncio

    import pandas as pd

    from youtu_rag_tpu.integrations.dtr.smg import SheetStateMachine

    df = pd.DataFrame({"a": [1, 2], "b": [3, 4]})
    tsv = tmp_path / "t.tsv"
    df.to_csv(tsv, sep="\t", index=False)
    out, _ = asyncio.run(
        SheetStateMachine(str(tsv)).execute_step("print(dfs['Sheet1']['a'].sum())")
    )
    assert "3" in out and "Error" not in out

    wb = tmp_path / "wb"
    wb.mkdir()
    df.to_csv(wb / "x.csv", index=False)
    df.to_csv(wb / "y.tsv", sep="\t", index=False)
    out, _ = asyncio.run(
        SheetStateMachine(str(wb)).execute_step(
            "print(sorted(dfs), dfs['y']['b'].sum())"
        )
    )
    assert "['x', 'y']" in out and "7" in out


def test_context_conditioned_experience_and_persistence(tmp_path):
    """Operator stats condition on the frame-context signature; memory
    round-trips through save/load (ref smg_module:1771-2032)."""
    from youtu_rag_tpu.integrations.dtr.smg import SheetStateMachine, SMGNode, TableState

    smg = SheetStateMachine("/tmp/x.csv")
    ctx_state = {"sales": TableState((10, 2), ["region", "revenue"], {})}
    smg.state = dict(ctx_state)
    sig = smg.context_signature()
    assert sig.startswith("f1:") and "region" in sig

    ok = SMGNode("merge the sheets", success=True)
    smg.record(ok, dict(ctx_state))
    bad = SMGNode("merge on id", success=False)
    smg.record(bad, dict(ctx_state))
    # context-conditioned rate (1 of 2) and a hint from the success
    assert smg.success_rate("merge something") == 0.5
    hints = smg.context_hints("merge whatever")
    assert "merge the sheets" in hints and "50%" in hints

    # different context → falls back to the global rate
    smg.state = {"other": TableState((3, 1), ["zzz"], {})}
    assert smg.success_rate("merge x") == 0.5  # global fallback

    p = tmp_path / "mem.json"
    smg.save_memory(p)
    fresh = SheetStateMachine("/tmp/x.csv")
    assert fresh.load_memory(p)
    fresh.state = dict(ctx_state)
    assert fresh.success_rate("merge q") == 0.5
    assert "merge the sheets" in fresh.context_hints("merge q")
    assert not fresh.load_memory(tmp_path / "missing.json")
