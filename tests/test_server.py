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
