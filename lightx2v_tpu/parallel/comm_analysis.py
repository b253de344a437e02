"""Communication-volume analysis of compiled SPMD programs.

The multichip dryrun grid proves the sharded programs compile and run —
but a sharding regression that silently all-gathers the whole sequence
would still pass it. This module inspects the compiled HLO of a sharded
step and asserts the collective volume matches the ANALYTIC bound of the
intended dataflow (VERDICT r4 next-#6):

* ulysses (reference all2all dataflow,
  lightx2v/attentions/distributed/comm/all2all.py:7-89): four
  all_to_alls per block (q, k, v seq->head + out head->seq), each moving
  the per-device shard of one (B, S, N, D) tensor — local elements
  B * S/sp * N * D. The transformer scans over blocks, so the scan body
  (and hence the HLO text) contains each op once.
* ring (reference ring_comm.py P2P rotation): one K + one V
  collective-permute per ring step, local elements B * S/sp * N * D
  each (the per-iteration block; lax.scan executes it sp-1 times).

Volumes are checked in ELEMENTS (dtype-independent, so a bf16<->f32
change does not mask a volume regression) with a 2x tolerance for
compiler-introduced reshuffles; exceeding it fails the dryrun.
"""

from __future__ import annotations

import re
from collections import defaultdict
from typing import Dict, Tuple

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "f8e4m3fn": 1, "f8e5m2": 1, "f8e4m3": 1,
    "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4,
    "s64": 8, "u64": 8, "f64": 8, "c64": 8, "c128": 16,
}

# ops that move data between devices (async variants emit -start/-done;
# count only the start so volume is not double-counted)
_COLLECTIVES = ("all-to-all", "collective-permute", "all-gather",
                "all-reduce", "reduce-scatter")

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
_OP_RE = re.compile(
    r"=\s*(\([^=]*?\)|[a-z0-9]+\[[0-9,]*\]\S*)\s+"
    r"(all-to-all|collective-permute|all-gather|all-reduce|reduce-scatter)"
    r"(-start)?\(")


def _shape_elems_bytes(shape_str: str) -> Tuple[int, int]:
    m = _SHAPE_RE.match(shape_str)
    if not m:
        return 0, 0
    dtype, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n, n * _DTYPE_BYTES.get(dtype, 4)


def collective_stats(hlo_text: str) -> Dict[str, Dict[str, int]]:
    """Parse compiled HLO text -> {op: {count, elements, bytes}} using the
    per-device (local) result shapes of every collective instruction."""
    stats: Dict[str, Dict[str, int]] = defaultdict(lambda: {"count": 0, "elements": 0, "bytes": 0})
    for m in _OP_RE.finditer(hlo_text):
        shape_s, op = m.group(1), m.group(2)
        for sm in _SHAPE_RE.finditer(shape_s):
            e, b = _shape_elems_bytes(sm.group(0))
            stats[op]["elements"] += e
            stats[op]["bytes"] += b
        stats[op]["count"] += 1
    return {k: dict(v) for k, v in stats.items()}


def check_sp_attention_volume(hlo_text: str, *, mode: str, batch: int,
                              seq: int, dim: int, sp: int, dp: int = 1,
                              tp: int = 1, tolerance: float = 2.0) -> Dict[str, int]:
    """Assert the compiled step's collective volume matches the analytic
    ulysses/ring bound. ``seq`` is the GLOBAL (padded) image-token count,
    ``dim`` = num_heads * head_dim; the per-device shard divides batch
    over dp and heads over tp as well. Returns parsed stats for logging.
    """
    stats = collective_stats(hlo_text)
    shard_elems = (batch // dp) * (seq // sp) * (dim // tp)
    if mode == "ulysses":
        got = stats.get("all-to-all", {"elements": 0, "count": 0})
        expect = 4 * shard_elems  # q, k, v seq->head + out head->seq
        assert got["count"] > 0, "ulysses step compiled with NO all-to-all"
        assert got["elements"] <= tolerance * expect, (
            f"ulysses all-to-all volume {got['elements']} elements exceeds "
            f"{tolerance}x the analytic bound {expect} "
            f"(4 x B*S/sp*D = 4 x {shard_elems}) — sharding regression?")
    elif mode == "ring":
        got = stats.get("collective-permute", {"elements": 0, "count": 0})
        expect = 2 * shard_elems  # K + V chunk per ring step
        assert got["count"] > 0, "ring step compiled with NO collective-permute"
        assert got["elements"] <= tolerance * expect, (
            f"ring collective-permute volume {got['elements']} elements "
            f"exceeds {tolerance}x the analytic per-iteration bound {expect} "
            f"(2 x B*S/sp*D = 2 x {shard_elems}) — sharding regression?")
    else:
        raise ValueError(mode)
    # either mode: a full-sequence all-gather inside the block stack is
    # the regression this guard exists for — bound total all-gather to
    # under one full (B, S, D) tensor per block-scan body
    ag = stats.get("all-gather", {"elements": 0})
    full = (batch // dp) * seq * (dim // tp)
    assert ag["elements"] <= tolerance * full, (
        f"all-gather volume {ag['elements']} elements exceeds {tolerance}x "
        f"one full activation ({full}) — all-gather-everything regression?")
    return stats
