// Shared view utilities: safe markdown rendering, time-series line chart,
// formatting helpers. Counterpart of rag_webui's assets/js/utils.js +
// utils/markdown-utils.js (escape-first rendering, table support).

import { h } from "../app.js";

// ------------------------------------------------------------- escaping

export function escapeHtml(s) {
  return String(s)
    .replaceAll("&", "&amp;").replaceAll("<", "&lt;").replaceAll(">", "&gt;")
    .replaceAll('"', "&quot;").replaceAll("'", "&#39;");
}

export function fmtDate(tsSeconds) {
  if (!tsSeconds) return "";
  const d = new Date(tsSeconds * 1000);
  return `${d.toLocaleDateString()} ${d.toLocaleTimeString()}`;
}

export function debounce(fn, ms = 250) {
  let timer = null;
  return (...args) => {
    clearTimeout(timer);
    timer = setTimeout(() => fn(...args), ms);
  };
}

// ------------------------------------------------------------- csv
//
// Quote-aware CSV row parser ("" escapes a quote inside a quoted field;
// commas/newlines inside quotes don't split — ref chat.js
// renderCSVInSidebar handles the same grammar before tabling).

export function parseCsv(text, maxRows = 500) {
  const rows = [];
  let field = "", row = [], inQuotes = false;
  const push = () => { row.push(field); field = ""; };
  const endRow = () => {
    push();
    if (row.length > 1 || row[0] !== "") rows.push(row);
    row = [];
  };
  for (let i = 0; i < text.length && rows.length < maxRows; i++) {
    const c = text[i];
    if (inQuotes) {
      if (c === '"') {
        if (text[i + 1] === '"') { field += '"'; i++; } else inQuotes = false;
      } else field += c;
    } else if (c === '"') inQuotes = true;
    else if (c === ",") push();
    else if (c === "\n") endRow();
    else if (c !== "\r") field += c;
  }
  if (field || row.length) endRow();
  return rows;
}

export function csvTable(text, maxRows = 200) {
  const rows = parseCsv(text, maxRows + 1);
  if (!rows.length) return h("div", { class: "dim" }, "(empty)");
  return h("table", {},
    h("tr", {}, ...rows[0].map((c) => h("th", {}, c))),
    ...rows.slice(1, maxRows).map((r) => h("tr", {}, ...r.map((c) => h("td", {}, c)))));
}

// ------------------------------------------------------------- markdown
//
// Escape-first line renderer: the input is escaped wholesale, then block
// structure (fences, headings, tables, lists, quotes, rules) and inline
// marks (code, bold, italic, http links) are layered on the escaped text.
// No raw HTML ever passes through (ref markdown-utils.js renders chat
// answers the same way; XSS-safety is the invariant the tests pin).

const INLINE_RULES = [
  // \x60 = backtick (kept out of regex literals — see renderMarkdown note)
  [/\x60([^\x60]+)\x60/g, (_, c) => `<code>${c}</code>`],
  [/\*\*([^*]+)\*\*/g, (_, c) => `<strong>${c}</strong>`],
  [/(^|[^*])\*([^*\s][^*]*)\*/g, (p, pre, c) => `${pre}<em>${c}</em>`],
  // links: only http(s) URLs, and the href is the escaped URL itself
  [/\[([^\]]+)\]\((https?:\/\/[^)\s]+)\)/g,
    (_, text, url) => `<a href="${url}" target="_blank" rel="noopener">${text}</a>`],
];

function inline(escaped) {
  let out = escaped;
  for (const [re, sub] of INLINE_RULES) out = out.replace(re, sub);
  return out;
}

function isTableRow(line) {
  return /^\s*\|.*\|\s*$/.test(line);
}

function splitRow(line) {
  const cells = line.trim().replace(/^\|/, "").replace(/\|$/, "").split("|");
  return cells.map((c) => c.trim());
}

export function renderMarkdown(text) {
  const root = h("div", { class: "md" });
  const lines = escapeHtml(text || "").split("\n");
  let html = "";
  let i = 0;
  let para = [];

  const flushPara = () => {
    if (para.length) {
      html += `<p>${inline(para.join("<br>"))}</p>`;
      para = [];
    }
  };

  while (i < lines.length) {
    const line = lines[i];

    // \x60 = backtick (literal backticks inside a regex read like template
    // literals to lexer-level tooling; the escape is unambiguous)
    if (/^\s*\x60\x60\x60/.test(line)) {  // fenced code block
      flushPara();
      const buf = [];
      i += 1;
      while (i < lines.length && !/^\s*\x60\x60\x60/.test(lines[i])) { buf.push(lines[i]); i += 1; }
      i += 1; // closing fence (or EOF)
      html += `<pre><code>${buf.join("\n")}</code></pre>`;
      continue;
    }

    if (isTableRow(line) && i + 1 < lines.length
        && /^\s*\|[\s:|-]+\|\s*$/.test(lines[i + 1])) {   // table
      flushPara();
      const head = splitRow(line);
      i += 2;
      const body = [];
      while (i < lines.length && isTableRow(lines[i])) { body.push(splitRow(lines[i])); i += 1; }
      html += "<table><thead><tr>"
        + head.map((c) => `<th>${inline(c)}</th>`).join("")
        + "</tr></thead><tbody>"
        + body.map((r) => `<tr>${r.map((c) => `<td>${inline(c)}</td>`).join("")}</tr>`).join("")
        + "</tbody></table>";
      continue;
    }

    const hm = line.match(/^(#{1,4})\s+(.*)$/);           // heading
    if (hm) {
      flushPara();
      const lvl = hm[1].length;
      html += `<h${lvl + 2}>${inline(hm[2])}</h${lvl + 2}>`;  // h3..h6: stay below app h2
      i += 1;
      continue;
    }

    if (/^\s*(---+|\*\*\*+)\s*$/.test(line)) {            // rule
      flushPara(); html += "<hr>"; i += 1; continue;
    }

    if (/^\s*&gt;\s?/.test(line)) {                       // blockquote (escaped >)
      flushPara();
      const buf = [];
      while (i < lines.length && /^\s*&gt;\s?/.test(lines[i])) {
        buf.push(lines[i].replace(/^\s*&gt;\s?/, "")); i += 1;
      }
      html += `<blockquote>${inline(buf.join("<br>"))}</blockquote>`;
      continue;
    }

    const ul = line.match(/^\s*[-*]\s+(.*)$/);            // lists (flat)
    const ol = line.match(/^\s*\d+[.)]\s+(.*)$/);
    if (ul || ol) {
      flushPara();
      const tag = ul ? "ul" : "ol";
      const pat = ul ? /^\s*[-*]\s+(.*)$/ : /^\s*\d+[.)]\s+(.*)$/;
      const items = [];
      while (i < lines.length) {
        const m = lines[i].match(pat);
        if (!m) break;
        items.push(`<li>${inline(m[1])}</li>`); i += 1;
      }
      html += `<${tag}>${items.join("")}</${tag}>`;
      continue;
    }

    if (!line.trim()) { flushPara(); i += 1; continue; }  // blank = paragraph break
    para.push(line); i += 1;
  }
  flushPara();
  root.innerHTML = html;
  return root;
}

// ------------------------------------------------------- line chart (SVG)
//
// Single-measure time series: one series (slot-1 hue stepped for the dark
// surface — no legend, the card title names it), 2px line, recessive
// horizontal grid, crosshair + tooltip on hover, min/max direct-labeled.

export function lineChart(points, { width = 560, height = 120, unit = "ms" } = {}) {
  const wrap = h("div", { class: "linechart" });
  if (points.length < 2) {
    wrap.appendChild(h("div", { class: "dim" }, "(collecting samples…)"));
    return wrap;
  }
  const PAD = { l: 6, r: 6, t: 10, b: 6 };
  const w = width - PAD.l - PAD.r, hgt = height - PAD.t - PAD.b;
  const vals = points.map((p) => p.value);
  const vmax = Math.max(...vals), vmin = Math.min(...vals);
  const span = vmax - vmin || 1;
  const x = (i) => PAD.l + (i / (points.length - 1)) * w;
  const y = (v) => PAD.t + (1 - (v - vmin) / span) * hgt;
  const ns = "http://www.w3.org/2000/svg";
  const svg = document.createElementNS(ns, "svg");
  svg.setAttribute("viewBox", `0 0 ${width} ${height}`);
  svg.setAttribute("class", "linechart-svg");
  // recessive grid: 3 horizontal lines
  for (const f of [0.25, 0.5, 0.75]) {
    const g = document.createElementNS(ns, "line");
    g.setAttribute("x1", PAD.l); g.setAttribute("x2", width - PAD.r);
    g.setAttribute("y1", PAD.t + f * hgt); g.setAttribute("y2", PAD.t + f * hgt);
    g.setAttribute("class", "grid");
    svg.appendChild(g);
  }
  const path = document.createElementNS(ns, "path");
  path.setAttribute("d", points.map((p, i) => `${i ? "L" : "M"}${x(i).toFixed(1)},${y(p.value).toFixed(1)}`).join(" "));
  path.setAttribute("class", "series");
  svg.appendChild(path);
  // selective direct labels: min + max only, in text ink
  for (const v of [vmax, vmin]) {
    const i = vals.indexOf(v);
    const lbl = document.createElementNS(ns, "text");
    lbl.setAttribute("x", Math.min(Math.max(x(i), PAD.l + 14), width - 40));
    lbl.setAttribute("y", v === vmax ? Math.max(y(v) - 4, 9) : Math.min(y(v) + 11, height - 2));
    lbl.setAttribute("class", "pt-label");
    lbl.textContent = `${v % 1 ? v.toFixed(1) : v}${unit}`;
    svg.appendChild(lbl);
  }
  // hover layer: crosshair + tooltip
  const cross = document.createElementNS(ns, "line");
  cross.setAttribute("class", "crosshair"); cross.setAttribute("visibility", "hidden");
  cross.setAttribute("y1", PAD.t); cross.setAttribute("y2", height - PAD.b);
  svg.appendChild(cross);
  const dot = document.createElementNS(ns, "circle");
  dot.setAttribute("r", 4); dot.setAttribute("class", "hoverdot");
  dot.setAttribute("visibility", "hidden");
  svg.appendChild(dot);
  const tip = h("div", { class: "charttip", style: "visibility:hidden" });
  wrap.appendChild(svg);
  wrap.appendChild(tip);
  svg.addEventListener("mousemove", (ev) => {
    const rect = svg.getBoundingClientRect();
    const fx = ((ev.clientX - rect.left) / rect.width) * width;
    const i = Math.round(((fx - PAD.l) / w) * (points.length - 1));
    if (i < 0 || i >= points.length) return;
    const p = points[i];
    cross.setAttribute("x1", x(i)); cross.setAttribute("x2", x(i));
    cross.setAttribute("visibility", "visible");
    dot.setAttribute("cx", x(i)); dot.setAttribute("cy", y(p.value));
    dot.setAttribute("visibility", "visible");
    tip.textContent = `${p.label || ""} ${p.value % 1 ? p.value.toFixed(2) : p.value}${unit}`;
    tip.style.visibility = "visible";
    tip.style.left = `${Math.min((x(i) / width) * 100, 78)}%`;
  });
  svg.addEventListener("mouseleave", () => {
    cross.setAttribute("visibility", "hidden");
    dot.setAttribute("visibility", "hidden");
    tip.style.visibility = "hidden";
  });
  return wrap;
}

// word-level diff (LCS) — expected vs executed answer on the QA-detail
// page (counterpart of rag_webui qa-detail's answer comparison).
export function renderDiff(expected, actual) {
  const a = (expected || "").split(/\s+/).filter(Boolean);
  const b = (actual || "").split(/\s+/).filter(Boolean);
  const n = a.length, m = b.length;
  // LCS table (answers are short; quadratic is fine at this size)
  const L = Array.from({ length: n + 1 }, () => new Array(m + 1).fill(0));
  for (let i = n - 1; i >= 0; i--) {
    for (let j = m - 1; j >= 0; j--) {
      L[i][j] = a[i] === b[j] ? L[i + 1][j + 1] + 1 : Math.max(L[i + 1][j], L[i][j + 1]);
    }
  }
  const box = document.createElement("div");
  box.className = "diff";
  let i = 0, j = 0;
  const push = (cls, words) => {
    if (!words.length) return;
    const el = document.createElement("span");
    el.className = cls;
    el.textContent = words.join(" ") + " ";
    box.appendChild(el);
  };
  let del = [], ins = [], same = [];
  const flush = () => { push("diff-del", del); push("diff-ins", ins); push("diff-same", same); del = []; ins = []; same = []; };
  while (i < n && j < m) {
    if (a[i] === b[j]) {
      if (del.length || ins.length) { push("diff-del", del); push("diff-ins", ins); del = []; ins = []; }
      same.push(a[i]); i++; j++;
    } else {
      if (same.length) { push("diff-same", same); same = []; }
      if (L[i + 1][j] >= L[i][j + 1]) { del.push(a[i]); i++; }
      else { ins.push(b[j]); j++; }
    }
  }
  del.push(...a.slice(i)); ins.push(...b.slice(j));
  flush();
  return box;
}
