"""Disk-tier lazy weight streaming (reference LazyWeightAsyncStreamManager
+ MemoryBuffer, lightx2v/common/offload/manager.py:59-386).

The reference runs Wan-14B on 8 GB VRAM + 16 GB RAM by keeping block
weights in per-block safetensors files, prefetching them with N daemon
disk threads into a bounded pinned-CPU buffer, and double-buffering the
CPU->GPU copy against compute. The TPU equivalent here:

* ``LazyBlockStore`` opens the converter's 'blocks' layout
  (``block_{i}.safetensors`` + ``non_block.safetensors``,
  tools/convert.py layout="blocks") and materializes one block at a time
  through the native mmap reader (csrc/safetensors_reader.cpp) — host RAM
  never holds the whole model;
* ``BlockPrefetcher`` is the MemoryBuffer analog: N worker threads pull
  the upcoming (step-ordered) block reads and fill a bounded host buffer
  (bounded by block count => bytes), a condition variable gates both
  ends;
* the denoise loop (runners/wan_runner._run_dit_streamed) consumes
  buffered host blocks and issues ``jax.device_put(block i+1)`` while the
  jitted block i computes — JAX async dispatch provides the reference's
  separate CUDA load/compute streams.

Quantized checkpoints stream unchanged: build_block_params keeps
int8/fp8/int4-packed weights + scales, and the per-block jitted step runs
the same quantized matmul kernels.
"""

from __future__ import annotations

import os
import threading
from collections import deque
from typing import Any, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from ...utils.logging_utils import logger
from ...utils.safetensors_io import load_file
from .config import WanArch
from .weights import build_block_params, build_non_block_params

Params = Dict[str, Any]


def is_blocks_layout(ckpt_dir: str) -> bool:
    return os.path.isfile(os.path.join(ckpt_dir, "non_block.safetensors")) and \
        os.path.isfile(os.path.join(ckpt_dir, "block_0.safetensors"))


class LazyBlockStore:
    """Per-block lazy access to a 'blocks'-layout checkpoint directory.

    Only ``non_block.safetensors`` is resident (pre/post weights, moved to
    device once); each ``block_{i}.safetensors`` is read on demand."""

    def __init__(self, ckpt_dir: str, arch: WanArch, compute_dtype=ml_dtypes.bfloat16):
        self.arch = arch
        self.compute_dtype = compute_dtype
        self.paths: List[str] = []
        for i in range(arch.num_layers):
            p = os.path.join(ckpt_dir, f"block_{i}.safetensors")
            if not os.path.isfile(p):
                raise FileNotFoundError(
                    f"blocks-layout checkpoint missing {p} (run tools/convert.py --layout blocks)")
            self.paths.append(p)
        nb = load_file(os.path.join(ckpt_dir, "non_block.safetensors"))
        small = build_non_block_params(nb, arch, compute_dtype)
        self.small: Params = jax.tree_util.tree_map(
            lambda x: None if x is None else jnp.asarray(x), small,
            is_leaf=lambda x: x is None)
        self.block_nbytes = os.path.getsize(self.paths[0])

    def num_blocks(self) -> int:
        return len(self.paths)

    def read_block(self, i: int) -> Params:
        """Disk -> host pytree for block i (numpy leaves; native parallel
        ingest when the C++ reader is built)."""
        return build_block_params(load_file(self.paths[i]), i, self.arch, self.compute_dtype)


class BlockPrefetcher:
    """N disk workers filling a bounded host-RAM block buffer.

    Mirrors the reference's disk-thread pool + MemoryBuffer byte budget
    (manager.py:120-178, 289-386): the consumer pops blocks in schedule
    order, freeing budget; workers block while the buffer is full."""

    def __init__(self, store: LazyBlockStore, num_workers: int = 2,
                 max_host_blocks: Optional[int] = None,
                 max_host_bytes: Optional[int] = None):
        # auto-cap by host cores: safetensors block reads are partly
        # CPU-bound (dtype casts + memcpy), and on a 1-vCPU host a second
        # worker REGRESSES throughput by time-slicing the consumer
        # (measured: 0.71 -> 0.33 GB/s, BENCHLOG_r04.md:146-163)
        num_workers = max(1, min(num_workers, os.cpu_count() or 1))
        if max_host_blocks is None:
            if max_host_bytes is not None:
                max_host_blocks = max(1, int(max_host_bytes // max(store.block_nbytes, 1)))
            else:
                max_host_blocks = 4
        # need at least workers+1 slots so the consumer's next block is
        # always claimable even when every worker holds a slot
        self.max_host_blocks = max(max_host_blocks, num_workers + 1)
        self.store = store
        self._schedule: deque = deque()
        self._buf: Dict[int, Params] = {}
        self._inflight = 0
        self._cond = threading.Condition()
        self._stop = False
        self._err: Optional[BaseException] = None
        self._workers = [threading.Thread(target=self._work, daemon=True)
                         for _ in range(max(1, num_workers))]
        for w in self._workers:
            w.start()

    # ---------------- producer side ----------------
    def schedule(self, indices: Iterable[int]) -> None:
        """Append upcoming block reads (call once per denoise step with
        range(num_blocks); duplicate indices are re-read — the buffer only
        ever holds what the budget allows)."""
        with self._cond:
            self._schedule.extend(indices)
            self._cond.notify_all()

    def _work(self):
        while True:
            with self._cond:
                while not self._stop and (
                    not self._schedule
                    or len(self._buf) + self._inflight >= self.max_host_blocks
                ):
                    self._cond.wait()
                if self._stop:
                    return
                idx = self._schedule.popleft()
                self._inflight += 1
            try:
                blk = self.store.read_block(idx)
            except BaseException as e:  # surfaced to the consumer
                with self._cond:
                    self._err = e
                    self._inflight -= 1
                    self._cond.notify_all()
                return
            with self._cond:
                self._buf[idx] = blk
                self._inflight -= 1
                self._cond.notify_all()

    # ---------------- consumer side ----------------
    def get(self, i: int, timeout: float = 120.0) -> Params:
        """Pop block i (blocks until a worker delivers it). Popping frees
        its buffer slot — peak host RAM stays <= max_host_blocks blocks."""
        deadline = None
        with self._cond:
            while i not in self._buf:
                if self._err is not None:
                    raise RuntimeError("disk prefetch worker failed") from self._err
                if not self._cond.wait(timeout=timeout):
                    raise TimeoutError(
                        f"block {i} not prefetched within {timeout}s "
                        f"(schedule it before consuming)")
            blk = self._buf.pop(i)
            self._cond.notify_all()
            return blk

    def close(self):
        with self._cond:
            self._stop = True
            self._cond.notify_all()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
