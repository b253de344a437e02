"""Launch-script surface lint: every scripts/wan/*.sh (the analogs of the
reference's scripts/wan launch set) must reference an existing config JSON,
use only flags lightx2v_tpu.infer actually defines, and name a registered
model_cls — so the scripts don't rot as the CLI evolves."""

import json
import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SCRIPTS = sorted((REPO / "scripts" / "wan").glob("*.sh"))


def _cli_flags():
    src = (REPO / "lightx2v_tpu" / "infer.py").read_text()
    return set(re.findall(r'add_argument\("(--[a-z_]+)"', src))


def _runner_keys():
    from lightx2v_tpu.utils.registry import RUNNER_REGISTER

    import lightx2v_tpu.runners  # noqa: F401  (registers all runners)

    return set(RUNNER_REGISTER.keys())


@pytest.mark.parametrize("script", SCRIPTS, ids=lambda p: p.name)
def test_launch_script_is_consistent(script):
    text = script.read_text()
    flags = set(re.findall(r"(--[a-z_]+)", text))
    unknown = flags - _cli_flags()
    assert not unknown, f"{script.name} uses unknown CLI flags: {unknown}"

    cfgs = re.findall(r"--config_json (\S+)", text)
    assert cfgs, f"{script.name} has no --config_json"
    for cfg in cfgs:
        path = REPO / cfg
        assert path.is_file(), f"{script.name} points at missing config {cfg}"
        json.loads(path.read_text())  # parses

    cls = re.findall(r"--model_cls (\S+)", text)
    assert cls and cls[0] in _runner_keys(), \
        f"{script.name} model_cls {cls} not in runner registry"
