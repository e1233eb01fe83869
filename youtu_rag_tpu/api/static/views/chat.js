// Chat view: SSE card rendering for the full event vocabulary
// (text_delta / reasoning_delta / tool_call / tool_output / plan / memory /
//  report / final / error / done — ref: chat_service SSE card protocol).

import { api, guard, h, state, t, toast } from "../app.js";

export async function renderChat(view) {
  const log = h("div", { id: "chat-log" });
  const kbSel = h("select", { id: "chat-kb" });
  const agentSel = h("select", { id: "chat-agent" });
  const memToggle = h("input", { type: "checkbox" });
  const input = h("input", { placeholder: t("chat.placeholder"), autocomplete: "off" });
  const sendBtn = h("button", { class: "primary", type: "submit" }, t("chat.send"));

  const fileBox = h("div", { class: "col" });
  const side = h("div", { class: "chat-side col" },
    h("div", { class: "card col" },
      h("h3", {}, t("chat.kb")), kbSel,
      h("h3", {}, t("chat.agent")), agentSel,
      h("h3", {}, t("chat.memory")),
      h("label", { class: "dim" }, memToggle, " enabled"),
      h("h3", {}, "attach files"), fileBox,
    ),
  );

  const form = h("form", { id: "composer" }, input, sendBtn);
  form.addEventListener("submit", guard(async (ev) => {
    ev.preventDefault();
    const q = input.value.trim();
    if (!q) return;
    input.value = "";
    const fileIds = [...fileBox.querySelectorAll("input:checked")].map((c) => c.value);
    await send(q, log, kbSel.value, fileIds);
  }));

  view.appendChild(h("div", { class: "chat-wrap" },
    h("div", { class: "chat-main" }, log, form), side));

  // populate selectors
  const [kbs, agents, mem, files] = await Promise.all([
    api("/api/knowledge-bases"), api("/api/agents"), api("/api/memory/config"),
    api("/api/files"),
  ]);
  const attachable = files.files.filter((f) => !f.name.startsWith(".meta")).slice(0, 12);
  if (!attachable.length) fileBox.appendChild(h("span", { class: "dim" }, "(no uploads)"));
  for (const f of attachable) {
    fileBox.appendChild(h("label", { class: "dim row", style: "gap:6px" },
      h("input", { type: "checkbox", value: f.name }), f.name));
  }
  kbSel.innerHTML = "";
  kbSel.appendChild(h("option", { value: "" }, "(no knowledge base)"));
  for (const kb of kbs.knowledge_bases) kbSel.appendChild(h("option", {}, kb.name));
  kbSel.value = state.kb || "";
  kbSel.addEventListener("change", () => {
    state.kb = kbSel.value;
    localStorage.setItem("yrt-kb", state.kb);
  });
  for (const a of agents.available_types) agentSel.appendChild(h("option", {}, a));
  agentSel.value = agents.current.type;
  agentSel.addEventListener("change", guard(async () => {
    await api("/api/agents/switch", { method: "POST", body: JSON.stringify({ type: agentSel.value }) });
    toast(`agent → ${agentSel.value}`, "ok");
  }));
  memToggle.checked = !!mem.memoryEnabled;
  memToggle.addEventListener("change", guard(async () => {
    await api("/api/memory/config", { method: "POST", body: JSON.stringify({ memoryEnabled: memToggle.checked }) });
  }));
  input.focus();
}

function bubble(log, cls, text = "") {
  const el = h("div", { class: `msg ${cls}` }, text);
  log.appendChild(el);
  log.scrollTop = log.scrollHeight;
  return el;
}

function card(log, cls, title, body = null, open = false) {
  const det = h("details", open ? { open: "" } : {},
    h("summary", {}, title),
    body ? h("pre", {}, body) : null);
  const el = h("div", { class: `card-ev ${cls}` }, det);
  log.appendChild(el);
  log.scrollTop = log.scrollHeight;
  return el;
}

async function send(q, log, kb, fileIds = []) {
  bubble(log, "user", q + (fileIds.length ? `\n📎 ${fileIds.join(", ")}` : ""));
  const body = { query: q, stream: true };
  if (kb) body.kb_id = kb;
  if (fileIds.length) body.file_ids = fileIds;
  const resp = await fetch("/api/chat", { method: "POST", body: JSON.stringify(body) });
  if (!resp.ok) { card(log, "error", `HTTP ${resp.status}`); return; }
  const reader = resp.body.getReader();
  const decoder = new TextDecoder();
  let bot = null, reasoning = null, buf = "";
  const toolCards = [];  // FIFO: tool_output pairs with the oldest open call
  for (;;) {
    const { done, value } = await reader.read();
    if (done) break;
    buf += decoder.decode(value, { stream: true });
    let idx;
    while ((idx = buf.indexOf("\n\n")) >= 0) {
      const line = buf.slice(0, idx); buf = buf.slice(idx + 2);
      if (!line.startsWith("data:")) continue;
      let ev;
      try { ev = JSON.parse(line.slice(5)); } catch { continue; }
      handleCard(ev);
    }
  }

  function handleCard(ev) {
    switch (ev.type) {
      case "text_delta":
        if (!bot) bot = bubble(log, "bot");
        bot.textContent += ev.content || "";
        log.scrollTop = log.scrollHeight;
        break;
      case "reasoning_delta":
        if (!reasoning) reasoning = card(log, "reasoning", "thinking…", "", false);
        reasoning.querySelector("pre") || reasoning.querySelector("details").appendChild(h("pre"));
        reasoning.querySelector("pre").textContent += ev.content || "";
        break;
      case "tool_call": {
        const c = card(log, "tool", `→ ${ev.name}`, ev.arguments || "", false);
        toolCards.push(c);
        break;
      }
      case "tool_output": {
        const c = toolCards.shift();
        const text = (ev.content || "").slice(0, 2000);
        if (c) c.querySelector("details").appendChild(h("pre", {}, text));
        else card(log, "tool", `← ${ev.name || "output"}`, text);
        break;
      }
      case "plan":
        card(log, "", "plan", JSON.stringify(ev.data || ev.content || {}, null, 2));
        break;
      case "memory":
        card(log, "memory", "memory context", ev.content || "");
        break;
      case "agent_switch":
        card(log, "", `agent → ${ev.content || ""}`);
        break;
      case "report":
      case "final":
        if (!bot) bot = bubble(log, "bot", ev.content || "");
        else if (!bot.textContent) bot.textContent = ev.content || "";
        break;
      case "error":
        card(log, "error", "error", ev.content || "", true);
        break;
      case "done":
        if (ev.trace_id) card(log, "", `done · trace ${ev.trace_id}`);
        bot = null; reasoning = null;
        break;
      default:
        break;
    }
  }
}
