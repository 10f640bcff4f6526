"""Minimal instant-search front page for the HTTP API — the dcs-web
UX surface (``cmd/dcs-web``'s instant-search page + ``static/
instant.js``) re-expressed as one self-contained original HTML file
served at ``/``:

* a search box with per-keystroke results (debounced ``/v1/search``,
  ``search_as_you_type`` semantics live server-side),
* prefix/fuzzy completions under the box (``/v1/suggest``),
* snippets per hit (``snippets=1``) and a latency/total line,
* an API-key field persisted in localStorage (the reference's UI is
  behind its own auth proxy; here the key IS the auth, so the page
  asks for it once).

No external assets, no frameworks — the page must work in the
sandbox's plainest browser and keep the server single-file deployable.
"""

INSTANT_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>dcs-ray search</title>
<style>
  :root { color-scheme: light dark; }
  body { font-family: system-ui, sans-serif; max-width: 52rem;
         margin: 2rem auto; padding: 0 1rem; }
  header { display: flex; gap: .75rem; align-items: baseline; }
  h1 { font-size: 1.25rem; margin: 0; }
  #key { width: 14rem; }
  #q { width: 100%; font-size: 1.15rem; padding: .45rem .6rem;
       margin-top: 1rem; box-sizing: border-box; }
  #sugg { margin: .25rem 0 0; padding: 0; list-style: none; }
  #sugg li { display: inline-block; margin-right: .75rem;
             cursor: pointer; opacity: .75; }
  #sugg li:hover { text-decoration: underline; opacity: 1; }
  #meta { margin: .75rem 0; opacity: .7; font-size: .9rem; }
  .hit { padding: .5rem 0; border-top: 1px solid rgba(128,128,128,.35); }
  .hit .head { display: flex; justify-content: space-between; }
  .hit .score { opacity: .6; font-variant-numeric: tabular-nums; }
  .hit pre { margin: .3rem 0 0; padding: .4rem .6rem; overflow-x: auto;
             background: rgba(128,128,128,.12); border-radius: 4px; }
  #err { color: #c0392b; }
</style>
</head>
<body>
<header>
  <h1>dcs-ray</h1>
  <label>api key <input id="key" type="password"
         placeholder="x-dcs-apikey"></label>
</header>
<input id="q" type="search" autofocus
       placeholder="query — terms, &quot;phrases&quot;, -negation, spa*, merg~">
<ul id="sugg"></ul>
<div id="meta"></div>
<div id="err"></div>
<div id="hits"></div>
<script>
"use strict";
const $ = (id) => document.getElementById(id);
$("key").value = localStorage.getItem("dcsray_key") || "";
$("key").addEventListener("change", () => {
  localStorage.setItem("dcsray_key", $("key").value);
  run();
});
let seq = 0, timer = null;
function esc(s) {
  return s.replace(/[&<>"]/g, (c) =>
    ({"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;"}[c]));
}
async function api(path) {
  const r = await fetch(path, {headers: {"x-dcs-apikey": $("key").value}});
  if (!r.ok) throw new Error(r.status + " " + (await r.text()).trim());
  return r.json();
}
async function run() {
  const q = $("q").value.trim();
  const my = ++seq;
  if (!q) {
    $("hits").innerHTML = ""; $("sugg").innerHTML = "";
    $("meta").textContent = ""; $("err").textContent = "";
    return;
  }
  try {
    const [res, sug] = await Promise.all([
      api("/v1/search?snippets=1&k=10&query=" + encodeURIComponent(q)),
      api("/v1/suggest?q=" + encodeURIComponent(q)).catch(() => null),
    ]);
    if (my !== seq) return;  // a newer keystroke superseded this one
    $("err").textContent = "";
    $("meta").textContent = res.results.length + " results · " +
      res.latency_ms + " ms";
    $("hits").innerHTML = res.results.map((r) =>
      '<div class="hit"><div class="head"><span>doc ' + r.doc_id +
      '</span><span class="score">' + r.score.toFixed(4) + "</span></div>" +
      (r.snippet ? "<pre>" + esc(r.snippet) + "</pre>" : "") +
      "</div>").join("");
    const items = (sug && sug.completions) || [];
    $("sugg").innerHTML = items.slice(0, 8).map((s) =>
      "<li>" + esc(s.term || "") + "</li>"
    ).join("");
    for (const li of $("sugg").children)
      li.onclick = () => {
        const words = $("q").value.trim().split(/\\s+/);
        words[words.length - 1] = li.textContent;
        $("q").value = words.join(" ") + " ";
        $("q").focus(); run();
      };
  } catch (e) {
    if (my !== seq) return;
    $("err").textContent = String(e.message || e);
    $("meta").textContent = ""; $("hits").innerHTML = "";
    $("sugg").innerHTML = "";
  }
}
$("q").addEventListener("input", () => {
  clearTimeout(timer);
  timer = setTimeout(run, 150);  // debounce keystrokes like instant.js
});
</script>
</body>
</html>
"""
