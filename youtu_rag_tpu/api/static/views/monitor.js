// Monitor view: storage health + metrics dashboard, embedding/reranker
// testers, recent trajectory runs. Counterpart of rag_webui's monitor
// screens + monitor_service HTML dashboard.

import { api, guard, h, t } from "../app.js";

export async function renderMonitor(view) {
  const healthBox = h("div", { class: "grid" });
  const metricsBox = h("pre", {});
  const runsBox = h("div", {});

  // embedding tester
  const embIn = h("textarea", { rows: "2", style: "flex:1", placeholder: "text to embed (one per line)" });
  const embBtn = h("button", {}, "Embed");
  const embOut = h("div", { class: "dim" });
  embBtn.addEventListener("click", guard(async () => {
    const texts = embIn.value.split("\n").map((s) => s.trim()).filter(Boolean);
    if (!texts.length) return;
    const t0 = performance.now();
    const r = await api("/api/embedding/embed", { method: "POST", body: JSON.stringify({ texts }) });
    embOut.textContent = `${r.embeddings.length} vectors · dim ${r.dimension} · ${(performance.now() - t0).toFixed(0)} ms` +
      ` · v[0][:4] = [${r.embeddings[0].slice(0, 4).map((x) => x.toFixed(4)).join(", ")}]`;
  }));

  // reranker tester
  const rrQuery = h("input", { placeholder: "query", style: "flex:1" });
  const rrDocs = h("textarea", { rows: "3", style: "width:100%", placeholder: "candidate documents (one per line)" });
  const rrBtn = h("button", {}, "Rerank");
  const rrOut = h("div", {});
  rrBtn.addEventListener("click", guard(async () => {
    const documents = rrDocs.value.split("\n").map((s) => s.trim()).filter(Boolean);
    if (!rrQuery.value.trim() || !documents.length) return;
    const r = await api("/api/reranker/rerank", {
      method: "POST", body: JSON.stringify({ query: rrQuery.value.trim(), documents }),
    });
    rrOut.innerHTML = "";
    for (const item of r.results) {
      rrOut.appendChild(h("div", { class: "row" },
        h("span", { class: "badge ok" }, item.relevance_score.toFixed(4)),
        h("span", {}, (item.document || "").slice(0, 120))));
    }
  }));

  view.appendChild(h("div", { class: "col" },
    h("div", { class: "card" }, h("h3", {}, t("monitor.health")), healthBox),
    h("div", { class: "card" }, h("h3", {}, t("monitor.metrics")), metricsBox),
    h("div", { class: "card col" },
      h("h3", {}, t("monitor.embed")),
      h("div", { class: "row" }, embIn, embBtn), embOut,
      h("h3", {}, t("monitor.rerank")),
      h("div", { class: "row" }, rrQuery, rrBtn), rrDocs, rrOut),
    h("div", { class: "card" }, h("h3", {}, t("monitor.runs")), runsBox)));

  const [health, metrics] = await Promise.all([
    api("/api/monitor/health"), api("/api/monitor/metrics"),
  ]);
  healthBox.appendChild(h("div", { class: "card" },
    h("div", { class: "row" }, h("strong", {}, "overall"),
      h("span", { class: `badge ${health.overall_healthy ? "ok" : "err"}` },
        `${health.healthy_backends}/${health.total_backends} healthy`)),
    h("div", { class: "dim" }, health.checked_at || "")));
  for (const [backend, ok] of Object.entries(health.backends || {})) {
    healthBox.appendChild(h("div", { class: "card" },
      h("div", { class: "row" }, h("strong", {}, backend),
        h("span", { class: `badge ${ok ? "ok" : "err"}` }, ok ? "healthy" : "unhealthy"))));
  }
  if (!Object.keys(health.backends || {}).length) {
    healthBox.appendChild(h("div", { class: "dim" }, "(no storage backends yet)"));
  }
  metricsBox.textContent = JSON.stringify(metrics, null, 2);

  try {
    const runs = await api("/api/trajectories?limit=10");
    if (!runs.available) {
      runsBox.appendChild(h("div", { class: "dim" }, "trajectory DB not configured (set YRT_DB_URL)"));
    } else if (!runs.trajectories.length) {
      runsBox.appendChild(h("div", { class: "dim" }, "(no runs yet)"));
    } else {
      const rows = runs.trajectories.map((r) =>
        h("tr", {},
          h("td", { class: "dim" }, new Date(r.created_at * 1000).toLocaleTimeString()),
          h("td", {}, (r.input || "").slice(0, 60)),
          h("td", { class: "dim" }, (r.output || r.error || "").slice(0, 80)),
          h("td", { class: "dim" }, `${(r.tool_calls || []).length}`)));
      runsBox.appendChild(h("table", {},
        h("tr", {}, h("th", {}, "time"), h("th", {}, "input"), h("th", {}, "output"), h("th", {}, "tools")),
        rows));
    }
  } catch { /* trajectories optional */ }
}
