"""Inference service: task queue + worker thread.

The reference spawns ``nproc_per_node`` torch.multiprocessing workers and
broadcasts pickled tasks over NCCL (lightx2v/server/service.py:77-309,
server/distributed_utils.py:53-97). On TPU that whole data plane
disappears: single-controller JAX drives every chip in this process, so
the service is one worker thread pulling from a queue and calling
``runner.run_pipeline()`` — task state machine and single-task-at-a-time
semantics preserved (reference server/utils.py ServiceStatus)."""

from __future__ import annotations

import os
import queue
import random
import threading
import time
import traceback
from typing import Any, Dict, Optional

from ..runners.base_runner import TaskStopped
from ..utils.logging_utils import logger
from .schema import TaskRequest


def generate_task_id() -> str:
    """XXXX-XXXX-XXXX-XXXX-XXXX ids (reference utils/generate_task_id.py:7-38)."""
    chars = "ABCDEFGHJKLMNPQRSTUVWXYZ23456789"
    return "-".join("".join(random.choices(chars, k=4)) for _ in range(5))


class TaskRecord:
    def __init__(self, req: TaskRequest):
        self.request = req
        self.status = "pending"
        self.error: Optional[str] = None
        self.save_video_path = req.save_video_path
        self.created = time.time()
        self.stop_event = threading.Event()  # per-task stop signal


class VideoGenerationService:
    """Owns the runner(s) and the task loop.

    ``num_replicas > 1`` is data parallelism for SERVING: N worker threads
    each own a runner pinned (via ``jax.default_device``) to a distinct
    chip, pulling from one shared queue — N concurrent single-chip tasks
    in one process, weights replicated per chip. This replaces the
    reference's multi-GPU task broadcast (server/service.py:77-309 sends
    ONE task to all ranks over NCCL) with throughput-oriented dp; for
    model-parallel tasks (``mesh_shape`` in config) keep one replica —
    the mesh already owns every chip."""

    def __init__(self, runner_factory, output_root: str = "./outputs",
                 server_config: Optional[Dict[str, Any]] = None,
                 num_replicas: int = 1):
        self._runner_factory = runner_factory
        self._output_root = os.path.abspath(output_root)
        self.server_config = server_config  # exposed via /v1/service/metadata
        self._queue: "queue.Queue[str]" = queue.Queue()
        self._tasks: Dict[str, TaskRecord] = {}
        self._lock = threading.Lock()
        self._metrics: Dict[str, Any] = {
            "tasks_submitted": 0, "tasks_completed": 0,
            "tasks_failed": 0, "tasks_stopped": 0,
            "task_seconds_total": 0.0, "last_task_seconds": None,
        }
        self._shutdown = threading.Event()
        self.num_replicas = max(1, int(num_replicas))
        self._runners: Dict[int, Any] = {}
        self._current: Dict[int, Optional[str]] = {i: None for i in range(self.num_replicas)}
        self._workers = []
        for i in range(self.num_replicas):
            w = threading.Thread(target=self._loop, args=(i,), daemon=True)
            w.start()
            self._workers.append(w)

    # ---------------- public API ----------------
    def submit(self, req: TaskRequest) -> TaskRecord:
        task_id = req.task_id or generate_task_id()
        req.task_id = task_id
        req.save_video_path = self._resolve_save_path(req.save_video_path, task_id)
        rec = TaskRecord(req)
        with self._lock:
            self._tasks[task_id] = rec
            self._metrics["tasks_submitted"] += 1
        self._queue.put(task_id)
        return rec

    def metrics(self) -> Dict[str, Any]:
        """Serving counters + the last pipeline's per-stage seconds
        (GET /v1/service/metrics)."""
        from ..utils.profiler import LAST_STAGES

        with self._lock:
            m = dict(self._metrics)
            m["queue_depth"] = self._queue.qsize()
            m["busy_replicas"] = sum(1 for v in self._current.values() if v)
        m["last_stage_seconds"] = dict(LAST_STAGES)
        return m

    def _resolve_save_path(self, requested: Optional[str], task_id: str) -> str:
        """Contain client-supplied save paths under output_root — the write-
        side mirror of the download handler's traversal guard (a remote
        caller must not be able to write to arbitrary filesystem paths)."""
        if requested:
            cand = os.path.abspath(requested)
            try:
                if os.path.commonpath([self._output_root, cand]) == self._output_root:
                    return cand  # already contained
            except ValueError:  # different drives (win) — fall through
                pass
            name = os.path.basename(requested)
        else:
            name = ""
        if not name or name in (".", ".."):
            name = f"{task_id}.mp4"
        return os.path.join(self._output_root, name)

    def get(self, task_id: str) -> Optional[TaskRecord]:
        with self._lock:
            return self._tasks.get(task_id)

    def all_tasks(self) -> Dict[str, TaskRecord]:
        with self._lock:
            return dict(self._tasks)

    def status(self) -> Dict[str, Any]:
        with self._lock:
            running = {i: t for i, t in self._current.items() if t is not None}
            busy = len(running) >= self.num_replicas
            first = next(iter(running.values()), None)
            out = {"service_status": "busy" if busy else "idle", "task_id": first}
            if self.num_replicas > 1:
                out["replicas"] = {str(i): t for i, t in self._current.items()}
            return out

    def stop_running(self, task_id: Optional[str] = None) -> Dict[str, Any]:
        """Request a stop. With ``task_id``, only that task's event is set;
        otherwise every currently running task is targeted. Each task has
        its OWN event, so a replica finishing an unrelated task can neither
        absorb nor clear another task's stop request."""
        with self._lock:
            running = [t for t in self._current.values() if t is not None]
            if task_id is not None:
                rec = self._tasks.get(task_id)
                if rec is None:
                    return {"stop_status": "do_nothing", "reason": "task not found"}
                if task_id not in running and rec.status not in ("pending", "processing"):
                    return {"stop_status": "do_nothing", "reason": f"task status: {rec.status}"}
                rec.stop_event.set()
                return {"stop_status": "requested", "reason": None, "task_id": task_id}
            if not running:
                return {"stop_status": "do_nothing", "reason": "no running task"}
            for tid in running:
                self._tasks[tid].stop_event.set()
            return {"stop_status": "requested", "reason": None,
                    "task_id": running[0] if len(running) == 1 else running}

    def shutdown(self):
        self._shutdown.set()
        for _ in range(self.num_replicas):
            self._queue.put(None)  # wake every worker

    # ---------------- worker ----------------
    def _make_replica_runner(self, replica: int):
        """Build replica i's runner. With ``mesh_shape`` in its config and
        num_replicas > 1, each replica is handed a DISJOINT contiguous
        group of prod(mesh_shape) devices via ``mesh_devices`` — dp over
        sp/tp sub-meshes (e.g. 2 replicas x {sp: 4} on 8 chips), not just
        dp over single chips."""
        runner = self._runner_factory()
        cfg = getattr(runner, "config", None)
        ms = cfg.get("mesh_shape") if cfg else None
        if ms and self.num_replicas > 1 and not cfg.get("mesh_devices"):
            import jax
            import numpy as np

            per = int(np.prod([int(v) for v in dict(ms).values()]))
            n = len(jax.devices())
            lo = replica * per
            if lo + per > n:
                raise ValueError(
                    f"num_replicas={self.num_replicas} x mesh {dict(ms)} needs "
                    f"{self.num_replicas * per} devices, have {n}")
            cfg["mesh_devices"] = list(range(lo, lo + per))
            logger.info(f"replica {replica}: sub-mesh devices {cfg['mesh_devices']}")
        return runner

    def _replica_scope(self, replica: int, runner=None):
        """Pin replica i's runner to chip i (thread-local default device) —
        uncommitted arrays and jit executions in this thread then land on
        that chip, so replicas compute concurrently. Mesh-owning replicas
        skip the pin: their placement comes from explicit shardings over
        their sub-mesh."""
        import contextlib

        if self.num_replicas <= 1:
            return contextlib.nullcontext()
        cfg = getattr(runner, "config", None) if runner is not None else None
        if cfg and cfg.get("mesh_devices"):
            return contextlib.nullcontext()
        import jax

        devs = jax.devices()
        return jax.default_device(devs[replica % len(devs)])

    def _loop(self, replica: int = 0):
        while not self._shutdown.is_set():
            task_id = self._queue.get()
            if task_id is None:
                break
            rec = self.get(task_id)
            if rec is None:
                continue
            with self._lock:
                self._current[replica] = task_id
                rec.status = "processing"
            t_task = time.perf_counter()
            try:
                if replica not in self._runners:
                    # construction pinned to the replica chip (single-chip
                    # dp); a mesh replica's weights get resharded onto its
                    # sub-mesh by the explicit shardings at run time
                    with self._replica_scope(replica):
                        self._runners[replica] = self._make_replica_runner(replica)
                runner = self._runners[replica]
                with self._replica_scope(replica, runner):
                    inputs = rec.request.model_dump()
                    inputs.update(inputs.pop("options", None) or {})
                    inputs = {k: v for k, v in inputs.items() if v not in (None, "")}
                    runner.set_inputs(inputs)
                    runner.stop_event = rec.stop_event
                    try:
                        if rec.stop_event.is_set():
                            raise TaskStopped("stopped before start")
                        runner.run_pipeline()
                    finally:
                        runner.stop_event = None
                rec.status = "completed"
            except TaskStopped:
                logger.info(f"task {task_id} stopped on request")
                rec.status = "stopped"
            except Exception as e:  # pragma: no cover
                logger.error(f"task {task_id} failed: {e}\n{traceback.format_exc()}")
                rec.status = "failed"
                rec.error = str(e)
            finally:
                dur = time.perf_counter() - t_task
                with self._lock:
                    self._current[replica] = None
                    key = {"completed": "tasks_completed", "stopped": "tasks_stopped"}.get(
                        rec.status, "tasks_failed")
                    self._metrics[key] += 1
                    self._metrics["task_seconds_total"] = round(
                        self._metrics["task_seconds_total"] + dur, 3)
                    self._metrics["last_task_seconds"] = round(dur, 3)
