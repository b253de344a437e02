"""Task schema (reference: lightx2v/server/schema.py:7-57)."""

from __future__ import annotations

from typing import Optional

from pydantic import BaseModel, Field


class TaskRequest(BaseModel):
    task_id: Optional[str] = None
    prompt: str = ""
    use_prompt_enhancer: bool = False
    negative_prompt: str = ""
    image_path: str = ""
    audio_path: str = ""
    num_fragments: int = 1
    save_video_path: str = ""
    infer_steps: Optional[int] = None
    target_video_length: Optional[int] = None
    seed: int = 42
    video_duration: Optional[int] = None
    # advanced per-task config overrides (web UI options panel):
    # attention_type / mm_type / feature_caching / tiny_vae / ... — merged
    # into the runner config by the service worker
    options: Optional[dict] = None


class TaskResponse(BaseModel):
    task_id: str
    task_status: str
    save_video_path: str


class TaskStatusResponse(BaseModel):
    task_id: str
    status: str
    error: Optional[str] = None


class ServiceStatusResponse(BaseModel):
    service_status: str  # "idle" | "busy"
    task_id: Optional[str] = None


class StopTaskResponse(BaseModel):
    stop_status: str
    reason: Optional[str] = None
