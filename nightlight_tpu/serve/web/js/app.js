/* nightlight-tpu visual job editor.
 *
 * Functional equivalent of the reference's Blockly workspace (web/js/*): a
 * palette of operators generated from the live registry schema, a sequence
 * canvas (with nesting for stackBatches.perBatch), a parameter inspector,
 * and a run button that POSTs the job and streams the chunked log. No
 * external dependencies.
 */
"use strict";

let SCHEMA = null;
let JOB = { type: "seq", steps: [] };   // the root sequence
let SELECTED = null;                     // currently selected step object

const $ = (id) => document.getElementById(id);
const logEl = $("log");

function log(s) {
  logEl.textContent += s;
  logEl.scrollTop = logEl.scrollHeight;
}

function catOf(type) {
  for (const [cat, types] of Object.entries(SCHEMA.categories)) {
    if (types.includes(type)) return cat;
  }
  return "seq";
}

function catColor(cat) {
  return getComputedStyle(document.documentElement).getPropertyValue(`--cat-${cat}`) || "#888";
}

function defaultOp(type) {
  const op = { type };
  for (const p of SCHEMA.operators[type].params) op[p.name] = p.default;
  if (type === "seq") op.steps = [];
  if (type === "stackBatches") op.perBatch = { type: "seq", steps: [] };
  return op;
}

/* ---------------- palette ---------------- */

function renderPalette() {
  const pal = $("palette");
  pal.innerHTML = "";
  for (const [cat, types] of Object.entries(SCHEMA.categories)) {
    const h = document.createElement("h3");
    h.textContent = cat;
    pal.appendChild(h);
    for (const t of types) {
      if (!SCHEMA.operators[t]) continue;
      const d = document.createElement("div");
      d.className = "pal-op";
      d.textContent = t;
      d.style.borderLeftColor = catColor(cat);
      d.title = SCHEMA.operators[t].doc;
      d.onclick = () => {
        const target = (SELECTED && SELECTED.type === "seq") ? SELECTED
          : (SELECTED && SELECTED.type === "stackBatches") ? SELECTED.perBatch
          : JOB;
        target.steps.push(defaultOp(t));
        render();
      };
      pal.appendChild(d);
    }
  }
}

/* ---------------- canvas ---------------- */

function summary(op) {
  const parts = [];
  for (const [k, v] of Object.entries(op)) {
    if (k === "type" || k === "steps" || k === "perBatch" || v === null) continue;
    if (typeof v === "object") continue;
    if (v === "" || v === 0 || v === false) continue;
    parts.push(`${k}=${v}`);
  }
  return parts.join(" ");
}

function renderSeq(container, seq) {
  seq.steps.forEach((op, i) => {
    const row = document.createElement("div");
    row.className = "step" + (op === SELECTED ? " selected" : "");
    row.style.borderLeftColor = catColor(catOf(op.type));
    const t = document.createElement("span");
    t.className = "t";
    t.textContent = op.type;
    const s = document.createElement("span");
    s.className = "summary";
    s.textContent = summary(op);
    const btns = document.createElement("span");
    btns.className = "btns";
    for (const [label, fn] of [
      ["↑", () => { if (i > 0) { seq.steps.splice(i, 1); seq.steps.splice(i - 1, 0, op); } }],
      ["↓", () => { if (i < seq.steps.length - 1) { seq.steps.splice(i, 1); seq.steps.splice(i + 1, 0, op); } }],
      ["×", () => { seq.steps.splice(i, 1); if (SELECTED === op) SELECTED = null; }],
    ]) {
      const b = document.createElement("button");
      b.textContent = label;
      b.onclick = (e) => { e.stopPropagation(); fn(); render(); };
      btns.appendChild(b);
    }
    row.append(t, s, btns);
    row.onclick = () => { SELECTED = op; render(); };
    container.appendChild(row);

    const inner = (op.type === "seq") ? op : (op.type === "stackBatches") ? op.perBatch : null;
    if (inner) {
      const nest = document.createElement("div");
      nest.className = "nest";
      renderSeq(nest, inner);
      container.appendChild(nest);
    }
  });
}

function render() {
  const seqEl = $("seq");
  seqEl.innerHTML = "";
  renderSeq(seqEl, JOB);
  renderInspector();
}

/* ---------------- inspector ---------------- */

function renderInspector() {
  const ins = $("inspector");
  ins.innerHTML = "<h3>Inspector</h3>";
  if (!SELECTED) {
    ins.insertAdjacentHTML("beforeend", '<div class="doc">Select a step to edit its parameters.</div>');
    return;
  }
  const op = SELECTED;
  ins.insertAdjacentHTML("beforeend",
    `<div class="doc"><b>${op.type}</b> — ${SCHEMA.operators[op.type]?.doc || ""}</div>`);
  for (const p of (SCHEMA.operators[op.type]?.params || [])) {
    const label = document.createElement("label");
    label.textContent = p.name;
    ins.appendChild(label);
    const isJson = typeof op[p.name] === "object" && op[p.name] !== null;
    const input = document.createElement(isJson ? "textarea" : "input");
    input.value = isJson ? JSON.stringify(op[p.name]) : (op[p.name] ?? "");
    input.onchange = () => {
      let v = input.value;
      if (isJson) {
        try { v = JSON.parse(input.value); } catch (e) { log(`\nbad JSON for ${p.name}: ${e}\n`); return; }
      } else if (p.kind === "number" && v !== "") {
        v = Number(v);
      }
      op[p.name] = v;
      render();
    };
    ins.appendChild(input);
  }
}

/* ---------------- run / json ---------------- */

async function runJob() {
  log("\n=== running job ===\n");
  try {
    const resp = await fetch("/api/v1/job", { method: "POST", body: JSON.stringify(JOB) });
    const reader = resp.body.getReader();
    const dec = new TextDecoder();
    for (;;) {
      const { done, value } = await reader.read();
      if (done) break;
      log(dec.decode(value));
    }
    log("\n=== done ===\n");
  } catch (e) {
    log(`\nerror: ${e}\n`);
  }
}

async function init() {
  SCHEMA = await (await fetch("/api/v1/schema")).json();
  renderPalette();
  render();
}

$("btnRun").onclick = runJob;
$("btnClear").onclick = () => { JOB = { type: "seq", steps: [] }; SELECTED = null; render(); };
$("btnPing").onclick = async () => {
  const r = await (await fetch("/api/v1/ping")).json();
  log(`\nping: ${JSON.stringify(r)}\n`);
};
$("btnJson").onclick = () => {
  $("jsonText").value = JSON.stringify(JOB, null, 2);
  $("jsonModal").style.display = "flex";
};
$("btnJsonClose").onclick = () => { $("jsonModal").style.display = "none"; };
$("btnJsonApply").onclick = () => {
  try {
    JOB = JSON.parse($("jsonText").value);
    SELECTED = null;
    $("jsonModal").style.display = "none";
    render();
  } catch (e) {
    log(`\nbad JSON: ${e}\n`);
  }
};

init();
