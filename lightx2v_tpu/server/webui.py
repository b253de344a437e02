"""Built-in web UI (the reference ships a Gradio app, app/gradio_demo.py;
gradio is not in this image, so the API server serves a dependency-free
single-page UI over the same /v1/tasks API)."""

WEB_UI_HTML = """<!doctype html>
<html>
<head>
<meta charset="utf-8">
<title>lightx2v_tpu</title>
<style>
  body { font-family: system-ui, sans-serif; max-width: 760px; margin: 2rem auto; padding: 0 1rem; background: #111; color: #eee; }
  h1 { font-size: 1.3rem; }  h1 span { color: #7ab8ff; }
  textarea, input { width: 100%; box-sizing: border-box; background: #1d1d1f; color: #eee;
                    border: 1px solid #333; border-radius: 6px; padding: .55rem; margin: .25rem 0 .75rem; }
  textarea { min-height: 4.5rem; }
  button { background: #2563eb; color: white; border: 0; padding: .6rem 1.4rem; border-radius: 6px;
           cursor: pointer; font-size: 1rem; }
  button:disabled { background: #444; }
  #status { margin: 1rem 0; color: #9a9; min-height: 1.4rem; }
  video { width: 100%; border-radius: 8px; margin-top: 1rem; }
  .row { display: flex; gap: 1rem; } .row > div { flex: 1; }
</style>
</head>
<body>
<h1><span>lightx2v</span>_tpu — video generation</h1>
<label>Prompt</label>
<textarea id="prompt" placeholder="A red panda surfing a wave at sunset..."></textarea>
<label>Negative prompt</label>
<input id="negative" placeholder="blurry, low quality">
<div class="row">
  <div><label>Seed</label><input id="seed" type="number" value="42"></div>
  <div><label>Steps (blank = config default)</label><input id="steps" type="number"></div>
</div>
<button id="go" onclick="submitTask()">Generate</button>
<div id="status"></div>
<div id="result"></div>
<script>
async function submitTask() {
  const btn = document.getElementById('go');
  const status = document.getElementById('status');
  const result = document.getElementById('result');
  btn.disabled = true; result.innerHTML = '';
  const body = {
    prompt: document.getElementById('prompt').value,
    negative_prompt: document.getElementById('negative').value,
    seed: parseInt(document.getElementById('seed').value || '42'),
  };
  const steps = document.getElementById('steps').value;
  if (steps) body.infer_steps = parseInt(steps);
  try {
    const r = await fetch('/v1/tasks', {method: 'POST', headers: {'Content-Type': 'application/json'},
                                        body: JSON.stringify(body)});
    const task = await r.json();
    if (!r.ok) throw new Error(JSON.stringify(task));
    status.textContent = 'task ' + task.task_id + ': queued...';
    let st;
    for (;;) {
      await new Promise(res => setTimeout(res, 3000));
      st = await (await fetch('/v1/tasks/' + task.task_id + '/status')).json();
      status.textContent = 'task ' + task.task_id + ': ' + st.status;
      if (st.status === 'completed' || st.status === 'failed') break;
    }
    if (st.status === 'failed') throw new Error(st.error || 'generation failed');
    const res = await (await fetch('/v1/tasks/' + task.task_id + '/result')).json();
    // download is rooted at the server's output_root; strip any ./ or / prefix
    const rel = res.save_video_path.replace(/^\\.?\\/+/, '');
    result.innerHTML = '<video controls autoplay loop src="/v1/files/download/' + rel + '"></video>';
  } catch (e) {
    status.textContent = 'error: ' + e.message;
  } finally {
    btn.disabled = false;
  }
}
</script>
</body>
</html>
"""
