"""Run the REFERENCE PyTorch implementation (/root/reference) on CPU so the
TPU rebuild can be asserted equivalent against the reference's own code —
not against oracles we wrote ourselves.

No reference code is copied: this module imports and executes the
reference in-place, with three small shims so a CUDA-built-for codebase
runs on a CPU-only torch:

* a ``loguru`` stand-in (not installed here),
* ``Tensor.cuda()`` / ``Tensor.pin_memory()`` as identity (the reference
  calls them unconditionally at load, model.py:80 / pre_infer.py:19),
* ``torch.cuda.get_device_capability`` -> (0, 0) (queried at import by
  attentions/common/sage_attn2.py:3).

Both stacks load the SAME synthetic safetensors checkpoint; attention
runs the reference's ``torch_sdpa`` op (CPU-capable) vs our XLA path.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "lightx2v"))


class Cfg(dict):
    """Minimal attribute-dict standing in for the reference's EasyDict."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


_installed = False


def install():
    """Make the reference package importable on CPU. Idempotent."""
    global _installed
    if _installed:
        return
    # the reference gates weight dtype on this (envs.py GET_DTYPE is
    # lru_cached, so it must be set before the first call)
    os.environ.setdefault("DTYPE", "BF16")

    if "loguru" not in sys.modules:
        mod = types.ModuleType("loguru")

        class _Logger:
            def __getattr__(self, name):
                return lambda *a, **kw: None

        mod.logger = _Logger()
        sys.modules["loguru"] = mod

    import torch

    # transformers' import chain registers torch.library ops and trips over
    # the factory-fn wrappers below if imported afterwards; import it first
    try:
        # resolve the lazy submodules the reference touches NOW, while
        # torch is still pristine
        from transformers import AutoModel, AutoTokenizer  # noqa: F401
    except Exception:
        pass

    if not torch.cuda.is_available():
        torch.cuda.get_device_capability = lambda *a, **kw: (0, 0)
        torch.Tensor.cuda = lambda self, *a, **kw: self
        torch.Tensor.pin_memory = lambda self, *a, **kw: self
        _torch_empty = torch.empty

        def _empty_no_pin(*a, **kw):
            kw.pop("pin_memory", None)
            return _torch_empty(*a, **kw)

        torch.empty = _empty_no_pin

        # Reference code creates tensors with device="cuda" unconditionally
        # (e.g. hunyuan pre_infer.py:50, cog scheduler.py:133); coerce the
        # device kwarg in torch factory fns + Generator so the same lines
        # run on CPU. (Harness shim, not a behavior change.)
        def _cpu_dev(kw):
            d = kw.get("device")
            if d is not None and "cuda" in str(d):
                kw["device"] = "cpu"
            return kw

        for _name in ("zeros", "ones", "tensor", "arange", "full", "randn",
                      "linspace", "empty"):
            _orig = getattr(torch, _name)

            def _wrap(*a, __orig=_orig, **kw):
                return __orig(*a, **_cpu_dev(kw))

            setattr(torch, _name, _wrap)

        _OrigGen = torch.Generator

        class _CpuGenerator(_OrigGen):
            def __new__(cls, device="cpu"):
                if "cuda" in str(device):
                    device = "cpu"
                return _OrigGen.__new__(cls, device)

        torch.Generator = _CpuGenerator

        _orig_to = torch.Tensor.to

        def _to_cpu(self, *a, **kw):
            a = tuple("cpu" if (isinstance(x, (str, torch.device)) and "cuda" in str(x)) else x for x in a)
            kw = _cpu_dev(kw)
            return _orig_to(self, *a, **kw)

        torch.Tensor.to = _to_cpu

        # t5/model.py evaluates torch.cuda.current_device() in a default
        # arg at import time (:518); xlm_roberta/model.py imports
        # torchvision.transforms (not installed) only for CLIPModel's
        # image preprocessing, which these tests don't touch.
        torch.cuda.current_device = lambda: "cpu"
        import importlib.machinery as _mach
        import importlib.util as _iutil

        def _stub_module(name):
            """Register an empty stub module (with a real spec so
            importlib/transformers introspection works). Returns it, or
            None if the real package exists."""
            if name in sys.modules:
                return None
            try:
                if _iutil.find_spec(name) is not None:
                    return None
            except (ImportError, ValueError):
                pass
            m = types.ModuleType(name)
            m.__spec__ = _mach.ModuleSpec(name, None)
            sys.modules[name] = m
            return m

        # q_linear.py imports vllm unconditionally (:3); the quantized
        # encoder classes are never exercised on CPU — any actual use of a
        # vllm op raises loudly
        vllm_mod = _stub_module("vllm")
        if vllm_mod is not None:
            class _NoVllm(types.ModuleType):
                def __getattr__(self, name):
                    def _raise(*a, **kw):
                        raise NotImplementedError(f"vllm stub: {name} not available on CPU")

                    return _raise

            ops_mod = _NoVllm("vllm._custom_ops")
            ops_mod.__spec__ = _mach.ModuleSpec("vllm._custom_ops", None)
            vllm_mod._custom_ops = ops_mod
            sys.modules["vllm._custom_ops"] = ops_mod
        # t5/tokenizer.py imports ftfy for text canonicalization (:5,13);
        # these tests never tokenize, so identity is fine
        ftfy_mod = _stub_module("ftfy")
        if ftfy_mod is not None:
            ftfy_mod.fix_text = lambda s, *a, **kw: s
        # xlm_roberta/model.py imports torchvision.transforms (:9) only
        # for CLIPModel's image preprocessing
        tv = _stub_module("torchvision")
        if tv is not None:
            tvt = _stub_module("torchvision.transforms")
            tv.transforms = tvt
        # wan/audio_adapter.py calls flash_attn.flash_attn_varlen_func in
        # PerceiverAttentionCA.forward (:129-142); provide the public varlen
        # API semantics (per-segment SDPA) so the reference module runs on CPU
        fa = _stub_module("flash_attn")
        if fa is not None:
            import torch.nn.functional as _F

            def flash_attn_varlen_func(q, k, v, cu_seqlens_q, cu_seqlens_k,
                                       max_seqlen_q=None, max_seqlen_k=None,
                                       dropout_p=0.0, softmax_scale=None,
                                       causal=False, window_size=(-1, -1),
                                       deterministic=False, **kw):
                assert not causal and dropout_p == 0.0
                out = torch.empty_like(q)
                nseg = cu_seqlens_q.shape[0] - 1
                for s in range(nseg):
                    q0, q1 = int(cu_seqlens_q[s]), int(cu_seqlens_q[s + 1])
                    k0, k1 = int(cu_seqlens_k[s]), int(cu_seqlens_k[s + 1])
                    # (L, H, C) -> (1, H, L, C)
                    qs = q[q0:q1].transpose(0, 1).unsqueeze(0)
                    ks = k[k0:k1].transpose(0, 1).unsqueeze(0)
                    vs = v[k0:k1].transpose(0, 1).unsqueeze(0)
                    o = _F.scaled_dot_product_attention(qs, ks, vs, scale=softmax_scale)
                    out[q0:q1] = o.squeeze(0).transpose(0, 1)
                return out

            fa.flash_attn_varlen_func = flash_attn_varlen_func

    # reference hunyuan/cog/audio modules import diffusers (not installed
    # here); register the faithful public-API stand-in first
    import _diffusers_stub

    _diffusers_stub.install()

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    # op registries fill at import (reference common/ops/__init__.py)
    import lightx2v.common.ops  # noqa: F401

    _installed = True


# ---------------------------------------------------------------- tiny arch

def tiny_config(task: str = "t2v", infer_steps: int = 8, enable_cfg: bool = True,
                seed: int = 7, frames: int = 3, height: int = 8, width: int = 8) -> Cfg:
    """A CPU-sized Wan config accepted by BOTH stacks (keys are the
    reference's; our arch_from_config reads the same names)."""
    return Cfg(
        model_cls="wan2.1",
        task=task,
        dim=64,
        ffn_dim=128,
        num_heads=2,
        num_layers=2,
        in_dim=36 if task == "i2v" else 16,
        out_dim=16,
        text_len=16,
        text_dim=32,
        clip_dim=24,
        freq_dim=256,
        patch_size=(1, 2, 2),
        eps=1e-6,
        infer_steps=infer_steps,
        enable_cfg=enable_cfg,
        sample_guide_scale=5.0,
        sample_shift=5.0,
        # pixel-space frame count; latent F = (len-1)//vae_stride[0]+1 = frames
        target_video_length=(frames - 1) * 4 + 1,
        target_shape=(16, frames, height, width),
        seed=seed,
        # reference plumbing
        mm_config=Cfg(),
        do_mm_calib=False,
        cpu_offload=False,
        feature_caching="NoCaching",
        parallel_attn_type=None,
        self_attn_1_type="torch_sdpa",
        cross_attn_1_type="torch_sdpa",
        cross_attn_2_type="torch_sdpa",
        vae_stride=(4, 8, 8),
        lat_h=height,
        lat_w=width,
    )


def make_checkpoint(cfg: Cfg, tmpdir: str, seed: int = 3) -> str:
    """Write one synthetic safetensors checkpoint both stacks load."""
    from lightx2v_tpu.models.wan.config import arch_from_config
    from lightx2v_tpu.models.wan.weights import init_random_weight_dict
    from lightx2v_tpu.utils import safetensors_io as st

    arch = arch_from_config(cfg)
    wd = init_random_weight_dict(arch, seed=seed, scale=0.05)
    # reference text_dim is baked into the weight shapes already
    path = os.path.join(tmpdir, "model.safetensors")
    st.save_file({k: np.asarray(v) for k, v in wd.items()}, path)
    return tmpdir


# ------------------------------------------------------------ reference run

def build_reference_model(cfg: Cfg, ckpt_dir: str):
    """Instantiate the reference WanModel + WanScheduler on CPU."""
    install()
    import torch

    from lightx2v.models.networks.wan.model import WanModel
    from lightx2v.models.schedulers.wan.scheduler import WanScheduler

    model = WanModel(ckpt_dir, cfg, torch.device("cpu"))
    sched = WanScheduler(cfg)
    sched.device = torch.device("cpu")  # ctor hardcodes cuda (scheduler.py:12)
    model.set_scheduler(sched)
    return model, sched


def reference_text_inputs(cfg: Cfg, seed: int = 11):
    """Synthetic (pre-embedding) T5 contexts, identical on both sides."""
    rng = np.random.default_rng(seed)
    lt = cfg["text_len"]
    ctx = rng.standard_normal((lt, cfg["text_dim"]), dtype=np.float32)
    ctx_null = rng.standard_normal((lt, cfg["text_dim"]), dtype=np.float32)
    return ctx, ctx_null


def run_reference_pipeline(cfg: Cfg, ckpt_dir: str, n_steps=None):
    """Reference denoise loop exactly as DefaultRunner.run() drives it
    (reference models/runners/default_runner.py:97-114). Returns the
    final latents and the initial latents (fp32 numpy)."""
    install()
    import torch

    model, sched = build_reference_model(cfg, ckpt_dir)
    ctx, ctx_null = reference_text_inputs(cfg)
    inputs = {
        "text_encoder_output": {
            "context": [torch.from_numpy(ctx).to(torch.bfloat16)],
            "context_null": [torch.from_numpy(ctx_null).to(torch.bfloat16)],
        }
    }
    if cfg["task"] == "i2v":
        clip, vae_y = reference_i2v_inputs(cfg)
        inputs["image_encoder_output"] = {
            "clip_encoder_out": torch.from_numpy(clip).to(torch.bfloat16),
            "vae_encode_out": torch.from_numpy(vae_y).to(torch.bfloat16),
        }
    sched.prepare()
    lat0 = sched.latents.float().numpy().copy()
    steps = n_steps if n_steps is not None else cfg["infer_steps"]
    with torch.no_grad():
        for i in range(steps):
            sched.step_pre(i)
            model.infer(inputs)
            sched.step_post()
    return lat0, sched.latents.float().numpy()


def reference_i2v_inputs(cfg: Cfg, seed: int = 13):
    """Synthetic CLIP tokens + VAE/mask conditioning shared by both sides."""
    rng = np.random.default_rng(seed)
    clip = rng.standard_normal((257, cfg["clip_dim"]), dtype=np.float32)
    _, f, h, w = cfg["target_shape"]
    y = rng.standard_normal((cfg["in_dim"] - 16, f, h, w), dtype=np.float32)
    return clip, y


# --------------------------------------------------------------- torch bridge

def to_torch_sd(sd):
    """numpy (incl. ml_dtypes bf16) state dict -> torch tensors (bf16 for
    float weights, matching the reference's load-time cast)."""
    import ml_dtypes
    import torch

    out = {}
    for k, v in sd.items():
        v = np.asarray(v)
        if v.dtype == np.dtype(ml_dtypes.bfloat16):
            out[k] = torch.from_numpy(v.astype(np.float32)).to(torch.bfloat16)
        elif np.issubdtype(v.dtype, np.floating):
            # the reference loads whole checkpoints as bf16 (hunyuan
            # model.py:60, cog model.py:36)
            out[k] = torch.from_numpy(np.ascontiguousarray(v)).to(torch.bfloat16)
        else:
            out[k] = torch.from_numpy(v)
    return out


class RecordingDict(dict):
    """weight_dict wrapper that records which keys the reference's weight
    classes actually consume (for two-sided key-coverage tests)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.requested = set()

    def __getitem__(self, k):
        self.requested.add(k)
        return super().__getitem__(k)


# ------------------------------------------------------------ hunyuan (tiny)

def tiny_hunyuan_cfg(task: str = "t2v") -> Cfg:
    return Cfg(
        task=task,
        attention_type="torch_sdpa",
        do_mm_calib=False,
        mm_config=Cfg(),
        cpu_offload=False,
        feature_caching="NoCaching",
        parallel_attn_type=None,
    )


def build_reference_hunyuan(cfg: Cfg, sd, arch):
    """Reference Hunyuan weight+infer objects at a tiny arch.

    The reference hardcodes the production sizes as instance attributes
    (transformer_infer.py:13-17, pre_infer.py:8, transformer_weights.py:9-10);
    the compute methods read them off ``self``, so shrinking the arch is an
    attribute override on the reference's own objects — no logic is changed."""
    install()

    from lightx2v.common.modules.weight_module import WeightModule, WeightModuleList
    from lightx2v.models.networks.hunyuan.infer.post_infer import HunyuanPostInfer
    from lightx2v.models.networks.hunyuan.infer.pre_infer import HunyuanPreInfer
    from lightx2v.models.networks.hunyuan.infer.transformer_infer import HunyuanTransformerInfer
    from lightx2v.models.networks.hunyuan.weights.post_weights import HunyuanPostWeights
    from lightx2v.models.networks.hunyuan.weights.pre_weights import HunyuanPreWeights
    from lightx2v.models.networks.hunyuan.weights.transformer_weights import (
        HunyuanTransformerDoubleBlock, HunyuanTransformerSingleBlock)

    class _TinyTransformerWeights(WeightModule):
        def __init__(self, config):
            super().__init__()
            self.config = config
            self.add_module("double_blocks", WeightModuleList(
                [HunyuanTransformerDoubleBlock(i, config) for i in range(arch.double_blocks)]))
            self.add_module("single_blocks", WeightModuleList(
                [HunyuanTransformerSingleBlock(i, config) for i in range(arch.single_blocks)]))

    pre_w = HunyuanPreWeights(cfg)
    post_w = HunyuanPostWeights(cfg)
    tr_w = _TinyTransformerWeights(cfg)
    pre_w.load(sd)
    post_w.load(sd)
    tr_w.load(sd)

    # The reference refiner calls its attention op with batched (B,L,H,D)
    # tensors (pre_infer.py:108-109), a layout only the flash_attn GPU ops
    # accept — TorchSDPAWeight assumes unbatched (L,H,D) and crashes on
    # CPU. Shim exactly this one op with plain masked SDPA (the reference's
    # own F.scaled_dot_product_attention semantics); projections/gates
    # around it stay reference code.
    import torch as _torch
    import torch.nn.functional as _F

    class _BatchedSDPA:
        def apply(self, q, k, v, attn_mask=None, **kw):
            x = _F.scaled_dot_product_attention(
                q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2),
                attn_mask=attn_mask)
            b, h, L, d = x.shape
            return x.transpose(1, 2).reshape(b, L, h * d)

    pre_w.txt_in_attn_1 = _BatchedSDPA()

    pre_i = HunyuanPreInfer(cfg)
    pre_i.heads_num = arch.heads_num
    tr_i = HunyuanTransformerInfer(cfg)
    tr_i.double_blocks_num = arch.double_blocks
    tr_i.single_blocks_num = arch.single_blocks
    tr_i.heads_num = arch.heads_num
    tr_i.hidden_size = arch.hidden_size
    tr_i.mlp_hidden_dim = arch.mlp_hidden_dim
    post_i = HunyuanPostInfer(cfg)
    return (pre_w, tr_w, post_w), (pre_i, tr_i, post_i)


def reference_hunyuan_rope(arch, f: int, h: int, w: int):
    """Reference get_nd_rotary_pos_embed (hunyuan scheduler.py:111-180) at
    the tiny arch's rope_dim_list. Returns torch (cos, sin), (S, head_dim)."""
    install()
    from lightx2v.models.schedulers.hunyuan.scheduler import get_nd_rotary_pos_embed

    return get_nd_rotary_pos_embed(list(arch.rope_dim_list), [f, h, w],
                                   theta=arch.rope_theta, use_real=True,
                                   theta_rescale_factor=1)
