// File manager: upload with live stage progress (PENDING → UPLOADING →
// OCR_PROCESSING → METADATA_EXTRACTING → CHUNK_PROCESSING → COMPLETED),
// file table with metadata, OCR viewer/editor with per-page markdown +
// layout overlays. Counterpart of rag_webui's file-manager.js + the
// reference's OCR screens (minio_files.py:1500-1811).

import { api, fmtBytes, guard, h, openModal, closeModal, t, toast } from "../app.js";

const STAGES = ["PENDING", "UPLOADING", "OCR_PROCESSING", "METADATA_EXTRACTING",
  "UPLOADING_TO_MINIO", "CHUNK_PROCESSING", "COMPLETED"];

export async function renderFiles(view) {
  const fileInput = h("input", { type: "file" });
  const upBtn = h("button", {}, t("files.upload"));
  const upProgBtn = h("button", { class: "primary" }, t("files.upload.progress"));
  const progWrap = h("div", { class: "col", style: "min-width:260px" });
  const tableBox = h("div", {});

  async function load() {
    const data = await api("/api/files");
    tableBox.innerHTML = "";
    if (!data.files.length) {
      tableBox.appendChild(h("div", { class: "dim" }, "(no files uploaded)"));
      return;
    }
    const rows = data.files
      .filter((f) => !f.name.startsWith(".meta"))
      .map((f) => {
        const meta = f.user_metadata || {};
        const ocrBtn = h("button", { class: "ghost" }, t("files.ocr"));
        ocrBtn.addEventListener("click", guard(() => openOcrModal(f.name)));
        const dlBtn = h("a", { href: `/api/files/${encodeURIComponent(f.name)}`, download: f.name },
          h("button", { class: "ghost" }, t("files.download")));
        const delBtn = h("button", { class: "danger ghost" }, t("files.delete"));
        delBtn.addEventListener("click", guard(async () => {
          if (!confirm(`delete ${f.name}?`)) return;
          await api(`/api/files/${encodeURIComponent(f.name)}`, { method: "DELETE" });
          await load();
        }));
        const badges = [];
        if (meta.kind) badges.push(h("span", { class: "badge" }, meta.kind));
        if (meta.is_manual_edited) badges.push(h("span", { class: "badge warn" }, t("ocr.edited")));
        if (meta.publish_date) badges.push(h("span", { class: "badge" }, meta.publish_date));
        return h("tr", {},
          h("td", {}, f.name, " ", ...badges),
          h("td", { class: "dim" }, fmtBytes(f.size)),
          h("td", { class: "dim" }, f.uploaded_at ? new Date(f.uploaded_at * 1000).toLocaleString() : ""),
          h("td", { class: "dim" }, (f.etag || "").slice(0, 10)),
          h("td", {}, h("div", { class: "row" }, ocrBtn, dlBtn, delBtn)));
      });
    tableBox.appendChild(h("table", {},
      h("tr", {}, h("th", {}, t("files.name")), h("th", {}, t("files.size")),
        h("th", {}, "uploaded"), h("th", {}, "etag"), h("th", {}, t("files.actions"))),
      rows));
  }

  upBtn.addEventListener("click", guard(async () => {
    const f = fileInput.files[0];
    if (!f) return;
    const fd = new FormData();
    fd.append("file", f);
    await fetch("/api/files/upload", { method: "POST", body: fd });
    toast(`uploaded ${f.name}`, "ok");
    await load();
  }));

  upProgBtn.addEventListener("click", guard(async () => {
    const f = fileInput.files[0];
    if (!f) return;
    const fd = new FormData();
    fd.append("file", f);
    const r = await fetch("/api/files/upload-with-progress", { method: "POST", body: fd });
    const { task_id } = await r.json();
    const bar = h("div", {});
    const stage = h("div", { class: "stage" }, "PENDING");
    const prog = h("div", { class: "col" },
      h("div", { class: "dim" }, f.name),
      h("div", { class: "progress" }, bar), stage);
    progWrap.appendChild(prog);
    const timer = setInterval(guard(async () => {
      const s = await api(`/api/files/upload-progress/${task_id}`);
      bar.style.width = `${s.progress}%`;
      const idx = STAGES.indexOf(s.status);
      stage.textContent = `${s.status} (${s.progress}%)` +
        (idx >= 0 ? ` · stage ${idx + 1}/${STAGES.length}` : "");
      if (s.status === "COMPLETED" || s.status === "FAILED") {
        clearInterval(timer);
        stage.textContent = s.status === "FAILED" ? `FAILED: ${s.error}` : "COMPLETED";
        if (s.status === "COMPLETED") toast(`processed ${f.name}`, "ok");
        await load();
        setTimeout(() => prog.remove(), 4000);
      }
    }), 500);
  }));

  view.appendChild(h("div", { class: "col" },
    h("div", { class: "card" },
      h("div", { class: "row" }, fileInput, upBtn, upProgBtn), progWrap),
    h("div", { class: "card" }, tableBox)));
  await load();
}

// ------------------------------------------------------------------ OCR modal

async function openOcrModal(name) {
  let data;
  try {
    data = await api(`/api/files/${encodeURIComponent(name)}/ocr`);
  } catch (e) {
    toast(t("ocr.none"), "err");
    return;
  }
  let pageIdx = 0;
  const pageBar = h("div", { class: "tabs-inner" });
  const editor = h("textarea", {});
  const layoutBox = h("div", {});
  const editedBadge = h("span", { class: "badge warn", style: "display:none" }, t("ocr.edited"));
  const saveBtn = h("button", { class: "primary" }, t("ocr.save"));
  const structBox = h("details", {}, h("summary", { class: "dim" }, "structured data"), h("pre", {}));

  function showPage(i) {
    pageIdx = i;
    const p = data.pages[i];
    editor.value = p.markdown_text || "";
    editedBadge.style.display = p.is_manual_edited ? "" : "none";
    pageBar.querySelectorAll("button").forEach((b, j) => b.classList.toggle("active", j === i));
    layoutBox.innerHTML = "";
    if (p.layout_image_url) {
      layoutBox.appendChild(h("img", { class: "layout", src: p.layout_image_url, alt: "layout overlay" }));
    }
    const pre = structBox.querySelector("pre");
    pre.textContent = p.structured_data ? JSON.stringify(p.structured_data, null, 2) : "(none)";
  }

  data.pages.forEach((p, i) => {
    const b = h("button", {}, `page ${p.page_num}`);
    b.addEventListener("click", () => showPage(i));
    pageBar.appendChild(b);
  });

  saveBtn.addEventListener("click", guard(async () => {
    await api(`/api/files/${encodeURIComponent(name)}/ocr`, {
      method: "PUT",
      body: JSON.stringify({ page_num: data.pages[pageIdx].page_num, markdown_text: editor.value }),
    });
    toast("OCR page saved — next build picks it up", "ok");
    data = await api(`/api/files/${encodeURIComponent(name)}/ocr`);
    showPage(pageIdx);
  }));

  openModal(h("div", {},
    h("div", { class: "row" },
      h("h2", {}, `OCR · ${name}`), editedBadge, h("div", { class: "spacer" }),
      h("button", { class: "ghost", onclick: closeModal }, "✕")),
    data.is_multi_page ? pageBar : null,
    h("div", { class: "row", style: "align-items:flex-start" },
      h("div", { style: "flex:1;min-width:0" }, editor, h("div", { class: "row", style: "margin-top:8px" }, saveBtn)),
      h("div", { style: "width:300px" }, layoutBox, structBox))));
  showPage(0);
}
