"""Host-side disk-tier measurement (VERDICT r3 weak #5): per-block
disk->RAM throughput, prefetch overlap efficiency, and buffer-cap
behavior of models/wan/lazy_offload.py — measurable on this image with no
TPU (the device side of streaming is tunnel-blocked; the README's
">=1.5 GB/s sustained" capacity model is validated or corrected here).

Protocol: 8 blocks at REAL Wan-14B int8 shapes (~270 MB each, the
streamed capacity config) written in the converter's blocks layout, then:
  1. per-block read throughput, page-cache-cold (posix_fadvise DONTNEED
     before each read) and warm;
  2. prefetcher sustained delivery rate (consumer popping as fast as
     blocks arrive), 1 and 2 workers;
  3. overlap efficiency at the flagship's compute cadence (~170 ms/block
     = 6.8 s forward / 40 blocks): stall time per block with prefetch
     running ahead vs the no-overlap lower bound;
  4. buffer cap: peak resident buffered blocks never exceeds
     max_host_blocks while 2x oversubscribed.

One JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from lightx2v_tpu.models.wan.config import PRESETS, WanArch  # noqa: E402
from lightx2v_tpu.models.wan.lazy_offload import BlockPrefetcher, LazyBlockStore  # noqa: E402
from lightx2v_tpu.models.wan.weights import init_random_weight_dict  # noqa: E402
from lightx2v_tpu.tools.convert import quantize_model, save_quantized  # noqa: E402

N_BLOCKS = int(os.environ.get("BENCH_DISK_BLOCKS", 8))
COMPUTE_S = float(os.environ.get("BENCH_DISK_COMPUTE_S", 0.17))


def emit(**row):
    print(json.dumps(row), flush=True)


def drop_cache(path: str):
    fd = os.open(path, os.O_RDONLY)
    try:
        os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
    finally:
        os.close(fd)


def main():
    kw = dict(PRESETS["wan2.1_14b"])
    kw["num_layers"] = N_BLOCKS  # 8 real-shape 14B blocks, cyclic schedule
    arch = WanArch(**kw, in_dim=16, out_dim=16, freq_dim=256, text_len=512,
                   text_dim=4096)
    tmp = tempfile.mkdtemp(prefix="disk_tier_")
    try:
        t0 = time.perf_counter()
        wd = init_random_weight_dict(arch, seed=0)
        qd = quantize_model(wd, "int8")
        del wd
        save_quantized(qd, tmp, layout="blocks", scheme="int8")
        del qd
        emit(stage="setup", blocks=N_BLOCKS, gen_s=round(time.perf_counter() - t0, 1))

        store = LazyBlockStore(tmp, arch)
        blk_gb = store.block_nbytes / 1e9
        emit(stage="layout", block_file_gb=round(blk_gb, 3))

        # 1. single-threaded per-block read, cold vs warm
        for label, cold in (("cold", True), ("warm", False)):
            times = []
            for i in range(N_BLOCKS):
                if cold:
                    drop_cache(store.paths[i])
                t0 = time.perf_counter()
                store.read_block(i)
                times.append(time.perf_counter() - t0)
            med = float(np.median(times))
            emit(stage=f"read_{label}", s_per_block=round(med, 3),
                 gbps=round(blk_gb / med, 2))

        # 2. prefetcher sustained delivery (consumer pops immediately)
        for workers in (1, 2):
            for i in range(N_BLOCKS):
                drop_cache(store.paths[i])
            with BlockPrefetcher(store, num_workers=workers, max_host_blocks=4) as pf:
                sched = list(range(N_BLOCKS)) * 2  # two passes = 2 "steps"
                pf.schedule(sched)
                t0 = time.perf_counter()
                for i in sched:
                    pf.get(i)
                dt = time.perf_counter() - t0
            emit(stage="prefetch_sustained", workers=workers,
                 blocks=len(sched), gbps=round(blk_gb * len(sched) / dt, 2),
                 s_total=round(dt, 2))

        # 3. overlap efficiency at the flagship cadence: consumer "computes"
        # COMPUTE_S per block; stall = wait time inside get()
        for i in range(N_BLOCKS):
            drop_cache(store.paths[i])
        passes = 3
        with BlockPrefetcher(store, num_workers=2, max_host_blocks=4) as pf:
            sched = list(range(N_BLOCKS)) * passes
            pf.schedule(sched)
            stall = 0.0
            t0 = time.perf_counter()
            for i in sched:
                s = time.perf_counter()
                pf.get(i)
                stall += time.perf_counter() - s
                time.sleep(COMPUTE_S)  # stands in for the jitted block step
            wall = time.perf_counter() - t0
        compute = COMPUTE_S * len(sched)
        emit(stage="overlap", compute_s=round(compute, 2), wall_s=round(wall, 2),
             stall_s=round(stall, 2),
             overlap_efficiency=round(max(0.0, 1 - (wall - compute) / compute), 3))

        # 3b. forced-cold overlap: evict each block right after the consumer
        # pops it — bounds the reference's 16 GB-RAM deploy where the page
        # cache cannot hold the model (above, passes 2+ run warm, the
        # realistic state on a host whose RAM fits the checkpoint)
        for i in range(N_BLOCKS):
            drop_cache(store.paths[i])
        with BlockPrefetcher(store, num_workers=2, max_host_blocks=4) as pf:
            sched = list(range(N_BLOCKS)) * passes
            pf.schedule(sched)
            stall = 0.0
            t0 = time.perf_counter()
            for i in sched:
                s = time.perf_counter()
                pf.get(i)
                stall += time.perf_counter() - s
                drop_cache(store.paths[i])
                time.sleep(COMPUTE_S)
            wall = time.perf_counter() - t0
        compute = COMPUTE_S * len(sched)
        emit(stage="overlap_cold", compute_s=round(compute, 2),
             wall_s=round(wall, 2), stall_s=round(stall, 2),
             overlap_efficiency=round(max(0.0, 1 - (wall - compute) / compute), 3))

        # 4. buffer cap under 2x oversubscription: sample peak buffered
        for i in range(N_BLOCKS):
            drop_cache(store.paths[i])
        cap = 3
        peak = 0
        stop = threading.Event()
        with BlockPrefetcher(store, num_workers=2, max_host_blocks=cap) as pf:
            def watch():
                nonlocal peak
                while not stop.is_set():
                    with pf._cond:
                        peak = max(peak, len(pf._buf) + pf._inflight)
                    time.sleep(0.002)

            w = threading.Thread(target=watch, daemon=True)
            w.start()
            sched = list(range(N_BLOCKS)) * 2
            pf.schedule(sched)
            for i in sched:
                pf.get(i)
                time.sleep(0.05)  # slow consumer -> buffer pressure
            stop.set()
            w.join()
        emit(stage="buffer_cap", max_host_blocks=max(cap, 3),
             observed_peak=peak, ok=peak <= max(cap, 3))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
