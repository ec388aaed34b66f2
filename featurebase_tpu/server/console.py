"""Built-in admin web console (the role of the reference's embedded
"lattice" React UI, reference: lattice/ + statik embedding; here a single
self-contained page served at /ui — query console (SQL/PQL), tables
browser with per-field detail, cluster node view, metrics incl. both
residency tiers, and the query history)."""

CONSOLE_HTML = """<!doctype html>
<html>
<head>
<meta charset="utf-8">
<title>featurebase-tpu console</title>
<style>
  body { font-family: ui-monospace, Menlo, Consolas, monospace; margin: 0;
         display: flex; height: 100vh; color: #222; }
  #side { width: 250px; background: #f4f4f6; border-right: 1px solid #ddd;
          padding: 12px; overflow-y: auto; flex-shrink: 0; }
  #main { flex: 1; display: flex; flex-direction: column; padding: 12px;
          overflow: hidden; }
  h1 { font-size: 14px; margin: 0 0 8px; }
  h2 { font-size: 12px; margin: 12px 0 4px; color: #666; }
  textarea { width: 100%; height: 110px; font: inherit; padding: 8px;
             box-sizing: border-box; border: 1px solid #ccc; }
  .row { margin: 8px 0; }
  button, .tab { font: inherit; padding: 4px 14px; cursor: pointer; }
  select, input { font: inherit; }
  table { border-collapse: collapse; margin-top: 10px; font-size: 12px; }
  th, td { border: 1px solid #ddd; padding: 3px 8px; text-align: left; }
  th { background: #fafafa; }
  #out { overflow: auto; flex: 1; }
  .err { color: #b00020; white-space: pre-wrap; }
  .idx { margin: 2px 0; cursor: pointer; color: #06c; }
  .fld { color: #555; margin-left: 12px; font-size: 12px; }
  #status { font-size: 11px; color: #888; margin-top: 14px;
            white-space: pre-wrap; }
  #tabs { border-bottom: 1px solid #ddd; margin-bottom: 6px; }
  .tab { display: inline-block; border: 1px solid #ddd;
         border-bottom: none; margin-right: 4px; background: #fafafa; }
  .tab.active { background: #fff; font-weight: bold; }
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
  <div id="tabs">
    <span class="tab active" data-t="query">query</span>
    <span class="tab" data-t="tables">tables</span>
    <span class="tab" data-t="cluster">cluster</span>
    <span class="tab" data-t="metrics">metrics</span>
    <span class="tab" data-t="history">history</span>
  </div>
  <div id="pane-query">
    <div class="row">
      <select id="mode">
        <option value="sql">SQL</option>
        <option value="pql">PQL</option>
      </select>
      <input id="index" placeholder="index (PQL only)" size="16">
      <button onclick="run()">Run (Ctrl-Enter)</button>
    </div>
    <textarea id="q" placeholder="SELECT ..."></textarea>
  </div>
  <div id="out"></div>
</div>
<script>
let schemaDoc = null;
function el(tag, text, cls) {
  const d = document.createElement(tag);
  if (text !== undefined) d.textContent = text;
  if (cls) d.className = cls;
  return d;
}
function renderTable(headers, rows) {
  const t = document.createElement('table');
  const tr = document.createElement('tr');
  for (const h of headers) tr.appendChild(el('th', h));
  t.appendChild(tr);
  for (const r of rows) {
    const tr = document.createElement('tr');
    for (const v of r) tr.appendChild(
      el('td', v === null ? 'NULL' : (typeof v === 'string' ? v :
                                      JSON.stringify(v))));
    t.appendChild(tr);
  }
  return t;
}
async function loadSchema() {
  try {
    schemaDoc = await (await fetch('/schema')).json();
    const elx = document.getElementById('schema');
    elx.innerHTML = '';
    for (const idx of (schemaDoc.indexes || [])) {
      const d = el('div', idx.name, 'idx');
      d.onclick = () => {
        document.getElementById('q').value =
          'SELECT * FROM ' + idx.name + ' LIMIT 10';
        showTab('query');
      };
      elx.appendChild(d);
      for (const f of (idx.fields || [])) {
        if (f.name.startsWith('_')) continue;
        elx.appendChild(el('div',
          f.name + ' : ' + ((f.options||{}).type || 'set'), 'fld'));
      }
    }
    const st = await (await fetch('/status')).json();
    document.getElementById('status').textContent =
      'state: ' + st.state + '\\ndevices: ' + (st.devices||[]).length +
      (st.nodes ? '\\nnodes: ' + st.nodes.length : '');
  } catch (e) { /* server restarting */ }
}
async function showTab(name) {
  for (const t of document.querySelectorAll('.tab'))
    t.classList.toggle('active', t.dataset.t === name);
  document.getElementById('pane-query').style.display =
    name === 'query' ? '' : 'none';
  const out = document.getElementById('out');
  if (name === 'query') return;
  out.innerHTML = '';
  try {
    if (name === 'tables') {
      for (const idx of ((schemaDoc||{}).indexes || [])) {
        out.appendChild(el('h2', idx.name));
        const rows = (idx.fields||[]).filter(f=>!f.name.startsWith('_'))
          .map(f => [f.name, (f.options||{}).type||'set',
                     (f.options||{}).keys ? 'yes' : '',
                     JSON.stringify(f.options||{})]);
        out.appendChild(renderTable(
          ['field','type','keys','options'], rows));
        const sh = await (await fetch('/shards?index=' +
                                      idx.name)).json();
        out.appendChild(el('div', 'shards: ' +
          JSON.stringify(sh.shards||[]), 'fld'));
      }
    } else if (name === 'cluster') {
      const st = await (await fetch('/status')).json();
      const nodes = st.nodes || [{id:'local', uri:'', state:st.state,
                                  isPrimary:true}];
      out.appendChild(renderTable(['id','uri','state','primary'],
        nodes.map(n => [n.id, n.uri, n.state,
                        n.isPrimary ? 'yes' : ''])));
    } else if (name === 'metrics') {
      const m = await (await fetch('/metrics.json')).json();
      out.appendChild(el('h2', 'counters'));
      out.appendChild(renderTable(['name','value'],
        Object.entries(m.counters||{})));
      out.appendChild(el('h2', 'residency'));
      out.appendChild(renderTable(['tier','bytes','budget','entries',
                                   'evictions'],
        [['HBM', (m.hbm_residency||{}).bytes,
          (m.hbm_residency||{}).budget, (m.hbm_residency||{}).entries,
          (m.hbm_residency||{}).evictions],
         ['host DRAM', (m.host_residency||{}).bytes,
          (m.host_residency||{}).budget, (m.host_residency||{}).entries,
          (m.host_residency||{}).evictions]]));
      out.appendChild(el('h2', 'latencies (p50/p99 s)'));
      out.appendChild(renderTable(['metric','count','p50','p99'],
        Object.entries(m.histograms||{}).map(
          ([k,h]) => [k, h.count, h.p50 && h.p50.toFixed(4),
                      h.p99 && h.p99.toFixed(4)])));
    } else if (name === 'history') {
      const h = await (await fetch('/query-history')).json();
      const rows = (h.queries||h||[]).map(q =>
        [q.index, q.query && q.query.slice(0, 80), q.node,
         q.elapsed_ms !== undefined ? q.elapsed_ms : q.age,
         q.error || '']);
      out.appendChild(renderTable(
        ['index','query','node','elapsed_ms','error'], rows));
    }
  } catch (e) {
    out.appendChild(el('div', String(e), 'err'));
  }
}
for (const t of document.querySelectorAll('.tab'))
  t.onclick = () => showTab(t.dataset.t);
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
    out.appendChild(el('div', String(e), 'err'));
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
