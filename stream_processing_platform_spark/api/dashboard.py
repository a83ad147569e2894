"""Single-file job dashboard served by the REST facade.

The reference ships a Flask + templates browser GUI
(`gui/app.py`, `gui/templates/dashboard.html`) backed by its
jobmanager API. Here the engine's own REST/SSE facade is the API, so
the dashboard is one dependency-free HTML page: it polls ``/jobs`` and
``/cluster/metrics``, renders the job table, and attaches an
``EventSource`` to the selected job's ``/metrics/stream`` SSE feed —
the same live-metrics push channel the reference exposed over
websockets. No build step, no static file tree, no framework; the page
is embedded so ``serve()`` stays a stdlib-only single binary.
"""

from __future__ import annotations

DASHBOARD_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>stream-processing-platform-spark</title>
<style>
  body { font-family: system-ui, sans-serif; margin: 2rem; color: #1a1a1a; }
  h1 { font-size: 1.2rem; }
  table { border-collapse: collapse; margin: 1rem 0; min-width: 40rem; }
  th, td { border: 1px solid #ccc; padding: .4rem .7rem; text-align: left;
           font-size: .85rem; }
  th { background: #f2f2f2; }
  tr.sel { background: #eef6ff; }
  #metrics { white-space: pre; font-family: ui-monospace, monospace;
             font-size: .8rem; background: #f8f8f8; padding: 1rem;
             border: 1px solid #ddd; max-width: 60rem; overflow-x: auto; }
  .muted { color: #777; font-size: .8rem; }
</style>
</head>
<body>
<h1>stream-processing-platform-spark — jobs</h1>
<div class="muted">cluster: <span id="cluster">loading…</span></div>
<table>
  <thead><tr><th>job id</th><th>pipeline</th><th>state</th><th>actions</th></tr></thead>
  <tbody id="jobs"></tbody>
</table>
<h1>live metrics <span class="muted" id="sel">(select a job)</span></h1>
<div id="metrics">—</div>
<script>
let es = null;
async function refresh() {
  const jobs = await (await fetch('/jobs')).json();
  const tb = document.getElementById('jobs');
  tb.innerHTML = '';
  for (const j of (jobs.jobs || [])) {
    // pipeline/state come from user-supplied POST /jobs bodies: build
    // cells with textContent, never innerHTML (stored-XSS sink).
    const tr = document.createElement('tr');
    for (const v of [j.job_id, j.pipeline, j.state]) {
      const td = document.createElement('td');
      td.textContent = v;
      tr.appendChild(td);
    }
    const actions = document.createElement('td');
    for (const [label, fn] of [['watch', watch], ['cancel', cancel]]) {
      const b = document.createElement('button');
      b.textContent = label;
      b.addEventListener('click', () => fn(j.job_id));
      actions.appendChild(b);
    }
    tr.appendChild(actions);
    tb.appendChild(tr);
  }
  const cm = await (await fetch('/cluster/metrics')).json();
  document.getElementById('cluster').textContent = JSON.stringify(cm);
}
function watch(id) {
  if (es) es.close();
  document.getElementById('sel').textContent = id;
  es = new EventSource(`/jobs/${id}/metrics/stream`);
  es.onmessage = (e) => {
    document.getElementById('metrics').textContent =
      JSON.stringify(JSON.parse(e.data), null, 2);
  };
  es.addEventListener('error', () => es && es.close());
}
async function cancel(id) {
  await fetch(`/jobs/${id}/cancel`, {method: 'POST'});
  refresh();
}
refresh();
setInterval(refresh, 3000);
</script>
</body>
</html>
"""
