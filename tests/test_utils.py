import json
import os

import ml_dtypes
import numpy as np
import pytest

from lightx2v_tpu.utils.config import ConfigDict, set_config
from lightx2v_tpu.utils.registry import Registry
from lightx2v_tpu.utils import safetensors_io as st


def test_configdict_attr_access():
    c = ConfigDict({"a": 1, "nested": {"b": 2}})
    assert c.a == 1
    assert c.nested.b == 2
    c.x = 5
    assert c["x"] == 5
    with pytest.raises(AttributeError):
        _ = c.missing


def test_set_config_precedence(tmp_path):
    # defaults < args < config_json < model config.json
    cfg_json = tmp_path / "task.json"
    cfg_json.write_text(json.dumps({"infer_steps": 7, "cpu_offload": True, "seed": 1}))
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    (model_dir / "config.json").write_text(json.dumps({"dim": 64, "seed": 2}))
    args = {
        "config_json": str(cfg_json),
        "model_path": str(model_dir),
        "task": "t2v",
        "seed": 0,
    }
    cfg = set_config(args)
    assert cfg.infer_steps == 7          # from task json
    assert cfg.cpu_offload is True       # task json overrides default
    assert cfg.dim == 64                 # model config
    assert cfg.seed == 2                 # model config wins over task json
    assert cfg.feature_caching == "NoCaching"  # default preserved


def test_set_config_i2v_video_length_fix(tmp_path):
    cfg_json = tmp_path / "t.json"
    cfg_json.write_text(json.dumps({"target_video_length": 80}))
    cfg = set_config({"config_json": str(cfg_json), "task": "i2v", "model_path": None})
    # 80 % 4 != 1 -> round to 81
    assert cfg.target_video_length == 81


def test_registry():
    r = Registry("test")

    @r.register("a")
    def fa():
        return 1

    r.register(["b", "c"], fa)
    assert r["a"]() == 1
    assert r["b"] is r["c"]
    with pytest.raises(KeyError):
        r.register("a", fa)
    with pytest.raises(KeyError):
        _ = r["nope"]


@pytest.mark.parametrize(
    "dtype",
    [np.float32, np.float16, ml_dtypes.bfloat16, np.int8, ml_dtypes.float8_e4m3fn],
)
def test_safetensors_roundtrip(tmp_path, dtype):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 6)).astype(dtype)
    y = rng.standard_normal((3,)).astype(np.float32)
    path = str(tmp_path / "t.safetensors")
    st.save_file({"x": x, "y": y}, path, metadata={"format": "pt"})
    loaded = st.load_file(path)
    np.testing.assert_array_equal(loaded["x"], x)
    np.testing.assert_array_equal(loaded["y"], y)


def test_safetensors_interop_with_upstream_lib(tmp_path):
    """Our writer must produce files the official safetensors lib can read."""
    import safetensors.numpy as stnp

    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    path = str(tmp_path / "t.safetensors")
    st.save_file({"x": x}, path)
    loaded = stnp.load_file(path)
    np.testing.assert_array_equal(loaded["x"], x)

    # and read files the official lib writes
    path2 = str(tmp_path / "t2.safetensors")
    stnp.save_file({"y": x * 2}, path2)
    loaded2 = st.load_file(path2)
    np.testing.assert_array_equal(loaded2["y"], x * 2)


def test_safetensors_sharded_index(tmp_path):
    a = np.ones((2, 2), np.float32)
    b = np.zeros((2,), np.float32)
    st.save_file({"a": a}, str(tmp_path / "m-00001.safetensors"))
    st.save_file({"b": b}, str(tmp_path / "m-00002.safetensors"))
    index = {"weight_map": {"a": "m-00001.safetensors", "b": "m-00002.safetensors"}}
    (tmp_path / "model.safetensors.index.json").write_text(json.dumps(index))
    out = st.load_sharded(str(tmp_path))
    assert set(out) == {"a", "b"}


def test_native_safetensors_loader(tmp_path):
    """C++ mmap reader (csrc/safetensors_reader.cpp): correctness vs the
    Python reader, including parallel bf16 widening."""
    from lightx2v_tpu.utils.native_loader import load_file_native, native_available

    if not native_available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(0)
    tensors = {
        "a": (rng.standard_normal((64, 128)) * 0.1).astype(ml_dtypes.bfloat16),
        "b": rng.standard_normal((33,)).astype(np.float32),
        "c": rng.integers(-100, 100, (8, 8)).astype(np.int8),
    }
    path = str(tmp_path / "n.safetensors")
    st.save_file(tensors, path)
    out = load_file_native(path, num_threads=4)
    for k in tensors:
        np.testing.assert_array_equal(out[k], tensors[k])
    widened = load_file_native(path, widen_bf16=True)
    assert widened["a"].dtype == np.float32
    np.testing.assert_allclose(widened["a"], tensors["a"].astype(np.float32))


def test_all_shipped_configs_parse():
    """Every JSON under configs/ must parse and carry coherent keys
    (mm_type resolvable, feature_caching known, mesh axes valid)."""
    import glob
    import json
    import os

    from lightx2v_tpu.ops.linear import resolve_mm

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    files = glob.glob(os.path.join(root, "**", "*.json"), recursive=True)
    assert len(files) >= 40, f"expected the full config matrix, got {len(files)}"
    known_caching = {"NoCaching", "Tea", "TaylorSeer", "TaylorWS", "Ada", "Custom"}
    for path in files:
        with open(path) as f:
            cfg = json.load(f)
        mm = (cfg.get("mm_config") or {}).get("mm_type", "Default")
        resolve_mm(mm)  # raises on unknown scheme
        assert cfg.get("feature_caching", "NoCaching") in known_caching, path
        if "mesh_shape" in cfg:
            assert set(cfg["mesh_shape"]) <= {"dp", "sp", "tp"}, path
        assert cfg.get("parallel_attn_type") in (None, "ulysses", "ring"), path
