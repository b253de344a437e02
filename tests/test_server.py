"""API server tests: full HTTP round trip against a live server with a
synthetic-weights runner (reference tests its server via client scripts,
scripts/server/post.py)."""

import json
import os
import time
import urllib.request

import numpy as np
import pytest

from lightx2v_tpu.infer import build_parser, init_runner
from lightx2v_tpu.server.api import ApiServer
from lightx2v_tpu.server.schema import TaskRequest
from lightx2v_tpu.server.service import VideoGenerationService, generate_task_id
from lightx2v_tpu.utils.config import set_config

CFG = os.path.join(os.path.dirname(__file__), "..", "configs", "wan_t2v_synthetic_smoke.json")


def _req(port, method, path, body=None):
    url = f"http://127.0.0.1:{port}{path}"
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method,
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_task_id_format():
    tid = generate_task_id()
    parts = tid.split("-")
    assert len(parts) == 5 and all(len(p) == 4 for p in parts)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    out = tmp_path_factory.mktemp("videos")
    args = build_parser().parse_args([
        "--model_cls", "wan2.1", "--task", "t2v",
        "--config_json", CFG, "--synthetic_weights",
    ])
    config = set_config(args)
    config["save_video_path"] = str(out / "task.mp4")
    service = VideoGenerationService(lambda: init_runner(config), output_root=str(out))
    srv = ApiServer(service, host="127.0.0.1", port=0, output_root=str(out))
    srv.serve_background()
    yield srv, out
    srv.shutdown()


def test_service_status_idle(server):
    srv, _ = server
    code, body = _req(srv.port, "GET", "/v1/service/status")
    assert code == 200
    assert body["service_status"] in ("idle", "busy")


def test_full_task_lifecycle(server):
    srv, out = server
    code, body = _req(srv.port, "POST", "/v1/tasks", {
        "prompt": "a lighthouse in a storm",
        "save_video_path": str(out / "t1.mp4"),
        "seed": 1,
    })
    assert code == 200
    tid = body["task_id"]
    assert body["task_status"] in ("pending", "processing")

    deadline = time.time() + 280
    status = None
    while time.time() < deadline:
        code, st = _req(srv.port, "GET", f"/v1/tasks/{tid}/status")
        assert code == 200
        status = st["status"]
        if status in ("completed", "failed"):
            break
        time.sleep(2)
    assert status == "completed", f"status={status} err={st.get('error')}"

    code, res = _req(srv.port, "GET", f"/v1/tasks/{tid}/result")
    assert code == 200
    assert os.path.isfile(res["save_video_path"])

    # file download endpoint
    fname = os.path.basename(res["save_video_path"])
    url = f"http://127.0.0.1:{srv.port}/v1/files/download/{fname}"
    with urllib.request.urlopen(url, timeout=30) as r:
        assert r.status == 200
        assert len(r.read()) > 100


def test_service_metrics_endpoint(server):
    """Runs after the lifecycle test: counters must reflect the completed
    task and carry the last pipeline's stage breakdown."""
    srv, _ = server
    code, m = _req(srv.port, "GET", "/v1/service/metrics")
    assert code == 200
    assert m["tasks_submitted"] >= 1
    assert m["tasks_completed"] >= 1
    assert m["last_task_seconds"] is not None and m["last_task_seconds"] > 0
    assert m["task_seconds_total"] >= m["last_task_seconds"]
    assert "queue_depth" in m and "busy_replicas" in m
    stages = m["last_stage_seconds"]
    assert any("DiT" in k for k in stages), stages
    assert any("VAE" in k for k in stages), stages


def test_web_ui_served(server):
    srv, _ = server
    url = f"http://127.0.0.1:{srv.port}/"
    with urllib.request.urlopen(url, timeout=30) as r:
        assert r.status == 200
        assert "text/html" in r.headers["Content-Type"]
        page = r.read().decode()
    assert "/v1/tasks" in page and "submitTask" in page


def test_unknown_task_404(server):
    srv, _ = server
    code, _ = _req(srv.port, "GET", "/v1/tasks/NOPE-NOPE/status")
    assert code == 404


def test_invalid_body_422(server):
    srv, _ = server
    code, _ = _req(srv.port, "POST", "/v1/tasks", {"seed": "not-an-int"})
    assert code == 422


def test_stop_when_idle(server):
    srv, _ = server
    code, body = _req(srv.port, "DELETE", "/v1/tasks/running")
    assert code == 200
    assert body["stop_status"] in ("do_nothing", "requested")


def test_per_task_stop_interrupts_between_stages(tmp_path):
    """Each task owns its stop event (service.py stop_running): stopping a
    specific task interrupts its pipeline at the next stage boundary and
    marks it 'stopped', without a shared flag another task could absorb."""
    import threading

    from lightx2v_tpu.runners.base_runner import DefaultRunner

    started = threading.Event()
    release = threading.Event()

    class SlowRunner(DefaultRunner):
        def __init__(self):
            super().__init__({"save_video_path": str(tmp_path / "x.mp4")})

        def init_modules(self):
            pass  # no models needed; pipeline is stubbed below

        def set_inputs(self, inputs):
            pass

        def run_input_encoder(self):
            started.set()
            assert release.wait(timeout=30)
            return {}

        def run_dit(self, encoder_out):  # must never be reached
            raise AssertionError("stop did not interrupt before DiT")

    svc = VideoGenerationService(SlowRunner, output_root=str(tmp_path))
    try:
        rec = svc.submit(TaskRequest(prompt="p"))
        assert started.wait(timeout=30)
        out = svc.stop_running(rec.request.task_id)
        assert out["stop_status"] == "requested"
        assert out["task_id"] == rec.request.task_id
        release.set()
        for _ in range(300):
            if rec.status == "stopped":
                break
            time.sleep(0.1)
        assert rec.status == "stopped"
        # stopping it again is a no-op with a reason
        out = svc.stop_running(rec.request.task_id)
        assert out["stop_status"] == "do_nothing"
    finally:
        release.set()
        svc.shutdown()


def test_save_path_traversal_contained(tmp_path):
    """Client-supplied save_video_path must resolve under output_root
    (write-side mirror of the download traversal guard)."""
    svc = VideoGenerationService.__new__(VideoGenerationService)
    svc._output_root = os.path.abspath(str(tmp_path))
    inside = svc._resolve_save_path(str(tmp_path / "ok.mp4"), "TID")
    assert inside == str(tmp_path / "ok.mp4")
    for evil in ("/etc/cron.d/x.mp4", "../../escape.mp4", "a/../../b.mp4"):
        p = svc._resolve_save_path(evil, "TID")
        assert os.path.commonpath([svc._output_root, p]) == svc._output_root, p
    assert svc._resolve_save_path(None, "TID").endswith("TID.mp4")


def test_service_metadata_endpoint(server):
    srv, _ = server
    code, meta = _req(srv.port, "GET", "/v1/service/metadata")
    assert code == 200
    assert any(n == "flash_attn3" for n, _ in meta["attention_ops"])
    assert any(n == "int4" for n, _ in meta["quant_schemes"])
    assert meta["device"]["device_count"] >= 1
    # model/task capability matrix (reference app model dropdown wiring):
    # every registered runner appears with its supported tasks
    matrix = {m["model_cls"]: m["tasks"] for m in meta["model_matrix"]}
    assert matrix["wan2.1"] == ["t2v", "i2v"]
    assert matrix["wan2.1_audio"] == ["audio"]
    assert matrix["cogvideox"] == ["t2v"]
    assert "hunyuan" in matrix and "wan2.1_causvid" in matrix


def test_webui_capability_controls():
    """The single-page app exposes the reference gradio app's capability
    surface: model/task matrix, op pickers, auto-config, config export."""
    from lightx2v_tpu.server.webui import WEB_UI_HTML

    for needle in ('id="matrix"', "downloadConfig", "model_matrix",
                   "buildBody", "autoConfig", 'id="attn"', 'id="quant"',
                   # round-5 breadth: all four caching modes, ret-steps,
                   # CFG toggle, sample shift, fps, seed randomize
                   # (reference gradio_demo.py:830-1030 control set)
                   'id="caching"', "TaylorSeer", "Ada", "Custom",
                   'id="retsteps"', 'id="cfgon"', 'id="shift"',
                   'id="fps"', "randSeed"):
        assert needle in WEB_UI_HTML, needle


def test_image_upload_endpoint(server):
    srv, out = server
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
    conn.request("POST", "/v1/files/upload?name=cond.png", body=b"\x89PNG fake",
                 headers={"Content-Length": "9"})
    resp = conn.getresponse()
    body = json.loads(resp.read())
    assert resp.status == 200
    assert os.path.isfile(body["path"])
    assert os.path.basename(body["path"]) == "cond.png"
    assert os.path.commonpath([str(out), body["path"]]) == str(out)


def test_auto_configure_tiers():
    """Memory decision tree (reference auto_configure, gradio_demo.py:470):
    resident bf16 -> resident int8 -> host streaming -> disk tier."""
    from lightx2v_tpu.server.autoconfig import auto_configure

    # 1.3B on a big chip: everything resident
    c = auto_configure("832x480", "1.3b", hbm_gb=32, host_ram_gb=64)
    assert not c["cpu_offload"] and c["quant_scheme"] == "bf16"
    # 14B on 20GB HBM: fits only quantized (14GB int8 + headroom)
    c = auto_configure("832x480", "14b", hbm_gb=20, host_ram_gb=64)
    assert c["quant_scheme"] == "int8" and not c["cpu_offload"]
    # 14B on 8GB HBM + 32GB host: host-RAM streaming
    c = auto_configure("832x480", "14b", hbm_gb=8, host_ram_gb=32)
    assert c["cpu_offload"] and not c["lazy_load"]
    # 14B on 8GB HBM + 12GB host: disk tier
    c = auto_configure("832x480", "14b", hbm_gb=8, host_ram_gb=12)
    assert c["lazy_load"] and c["max_memory"] >= 2
    # 720P turns on tiled VAE
    assert auto_configure("1280x720", "1.3b", hbm_gb=32, host_ram_gb=64)["use_tiling_vae"]


def test_task_options_merge_into_config(server):
    """Per-task advanced options (web UI panel) flow into the runner config."""
    srv, out = server
    code, body = _req(srv.port, "POST", "/v1/tasks", {
        "prompt": "options test", "seed": 3,
        "save_video_path": str(out / "opt.mp4"),
        "options": {"use_tiling_vae": False, "sample_guide_scale": 4.0},
    })
    assert code == 200
    tid = body["task_id"]
    deadline = time.time() + 280
    while time.time() < deadline:
        code, st = _req(srv.port, "GET", f"/v1/tasks/{tid}/status")
        if st["status"] in ("completed", "failed"):
            break
        time.sleep(2)
    assert st["status"] == "completed", st.get("error")


def test_dp_serving_two_replicas(tmp_path):
    """num_replicas=2: two runners (one per virtual device) drain the queue
    concurrently; both tasks complete and per-replica status is exposed."""
    args = build_parser().parse_args([
        "--model_cls", "wan2.1", "--task", "t2v",
        "--config_json", CFG, "--synthetic_weights",
    ])
    import copy

    config = set_config(args)
    # per-replica config copies: runners mutate config via set_inputs
    service = VideoGenerationService(lambda: init_runner(copy.deepcopy(config)),
                                     output_root=str(tmp_path), num_replicas=2)
    recs = [service.submit(TaskRequest(prompt=f"clip {i}",
                                       save_video_path=str(tmp_path / f"r{i}.mp4"),
                                       seed=i)) for i in range(2)]
    deadline = time.time() + 280
    while time.time() < deadline and any(r.status not in ("completed", "failed") for r in recs):
        time.sleep(0.5)
    assert [r.status for r in recs] == ["completed", "completed"], \
        [(r.status, r.error) for r in recs]
    assert len(service._runners) == 2  # both replicas exercised
    st = service.status()
    assert "replicas" in st and len(st["replicas"]) == 2
    for i in range(2):
        assert os.path.exists(tmp_path / f"r{i}.mp4")
    service.shutdown()


def test_dp_serving_over_sub_meshes(tmp_path):
    """num_replicas=2 with mesh_shape {sp: 2}: each replica runs its task
    over its OWN disjoint 2-device sub-mesh (dp x sp serving)."""
    args = build_parser().parse_args([
        "--model_cls", "wan2.1", "--task", "t2v",
        "--config_json", CFG, "--synthetic_weights",
    ])
    import copy

    config = set_config(args)
    config["mesh_shape"] = {"sp": 2}
    service = VideoGenerationService(lambda: init_runner(copy.deepcopy(config)),
                                     output_root=str(tmp_path), num_replicas=2)
    recs = [service.submit(TaskRequest(prompt=f"clip {i}",
                                       save_video_path=str(tmp_path / f"m{i}.mp4"),
                                       seed=i)) for i in range(2)]
    deadline = time.time() + 280
    while time.time() < deadline and any(r.status not in ("completed", "failed") for r in recs):
        time.sleep(0.5)
    assert [r.status for r in recs] == ["completed", "completed"], \
        [(r.status, r.error) for r in recs]
    groups = [tuple(service._runners[i].config["mesh_devices"]) for i in range(2)]
    assert groups[0] == (0, 1) and groups[1] == (2, 3)
    for i in range(2):
        assert os.path.exists(tmp_path / f"m{i}.mp4")
    service.shutdown()
