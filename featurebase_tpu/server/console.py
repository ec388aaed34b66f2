"""Built-in admin web console (the role of the reference's embedded
"lattice" React UI, reference: lattice/ + statik embedding; here a single
self-contained page served at /ui — schema browser, SQL/PQL query console
with table rendering, cluster status)."""

CONSOLE_HTML = """<!doctype html>
<html>
<head>
<meta charset="utf-8">
<title>featurebase-tpu console</title>
<style>
  body { font-family: ui-monospace, Menlo, Consolas, monospace; margin: 0;
         display: flex; height: 100vh; color: #222; }
  #side { width: 260px; background: #f4f4f6; border-right: 1px solid #ddd;
          padding: 12px; overflow-y: auto; }
  #main { flex: 1; display: flex; flex-direction: column; padding: 12px; }
  h1 { font-size: 14px; margin: 0 0 8px; }
  h2 { font-size: 12px; margin: 12px 0 4px; color: #666; }
  textarea { width: 100%; height: 110px; font: inherit; padding: 8px;
             box-sizing: border-box; border: 1px solid #ccc; }
  .row { margin: 8px 0; }
  button { font: inherit; padding: 4px 14px; cursor: pointer; }
  select { font: inherit; }
  table { border-collapse: collapse; margin-top: 10px; font-size: 12px; }
  th, td { border: 1px solid #ddd; padding: 3px 8px; text-align: left; }
  th { background: #fafafa; }
  #out { overflow: auto; flex: 1; }
  .err { color: #b00020; white-space: pre-wrap; }
  .idx { margin: 2px 0; }
  .fld { color: #555; margin-left: 12px; font-size: 12px; }
  #status { font-size: 11px; color: #888; margin-top: 14px;
            white-space: pre-wrap; }
</style>
</head>
<body>
<div id="side">
  <h1>featurebase-tpu</h1>
  <h2>schema</h2>
  <div id="schema">loading…</div>
  <h2>status</h2>
  <div id="status"></div>
</div>
<div id="main">
  <div class="row">
    <select id="mode">
      <option value="sql">SQL</option>
      <option value="pql">PQL</option>
    </select>
    <input id="index" placeholder="index (PQL only)" size="16">
    <button onclick="run()">Run (Ctrl-Enter)</button>
  </div>
  <textarea id="q" placeholder="SELECT ..."></textarea>
  <div id="out"></div>
</div>
<script>
async function loadSchema() {
  try {
    const s = await (await fetch('/schema')).json();
    const el = document.getElementById('schema');
    el.innerHTML = '';
    for (const idx of (s.indexes || [])) {
      const d = document.createElement('div');
      d.className = 'idx';
      d.textContent = idx.name;
      el.appendChild(d);
      for (const f of (idx.fields || [])) {
        if (f.name.startsWith('_')) continue;
        const fd = document.createElement('div');
        fd.className = 'fld';
        fd.textContent = f.name + ' : ' + ((f.options||{}).type || 'set');
        el.appendChild(fd);
      }
    }
    const st = await (await fetch('/status')).json();
    document.getElementById('status').textContent =
      'state: ' + st.state + '\\ndevices: ' + (st.devices||[]).length +
      (st.nodes ? '\\nnodes: ' + st.nodes.length : '');
  } catch (e) { /* server restarting */ }
}
function renderTable(headers, rows) {
  const t = document.createElement('table');
  const tr = document.createElement('tr');
  for (const h of headers) {
    const th = document.createElement('th'); th.textContent = h;
    tr.appendChild(th);
  }
  t.appendChild(tr);
  for (const r of rows) {
    const tr = document.createElement('tr');
    for (const v of r) {
      const td = document.createElement('td');
      td.textContent = v === null ? 'NULL' : JSON.stringify(v);
      tr.appendChild(td);
    }
    t.appendChild(tr);
  }
  return t;
}
async function run() {
  const mode = document.getElementById('mode').value;
  const q = document.getElementById('q').value;
  const out = document.getElementById('out');
  out.innerHTML = '';
  try {
    let resp;
    if (mode === 'sql') {
      resp = await fetch('/sql', {method: 'POST',
        body: JSON.stringify({sql: q})});
      const j = await resp.json();
      if (j.error) throw new Error(j.error);
      const fields = ((j.schema||{}).fields)||[];
      out.appendChild(renderTable(fields.map(f=>f.name), j.data||[]));
    } else {
      const idx = document.getElementById('index').value;
      resp = await fetch('/index/' + idx + '/query',
                         {method: 'POST', body: q});
      const j = await resp.json();
      if (j.error) throw new Error(j.error);
      const pre = document.createElement('pre');
      pre.textContent = JSON.stringify(j.results, null, 2);
      out.appendChild(pre);
    }
  } catch (e) {
    const d = document.createElement('div');
    d.className = 'err';
    d.textContent = String(e);
    out.appendChild(d);
  }
  loadSchema();
}
document.getElementById('q').addEventListener('keydown', (e) => {
  if (e.key === 'Enter' && (e.ctrlKey || e.metaKey)) run();
});
loadSchema();
</script>
</body>
</html>
"""
