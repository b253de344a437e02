"""Wan2.1 runners (reference: lightx2v/models/runners/wan_runner.py and
wan_distill_runner.py).

``wan2.1``        — UniPC, CFG double-pass (batched here), 40-50 steps.
``wan2.1_distill``— 4-step LCM, CFG-free (reference wan_distill_runner.py:21-49).

Checkpoint layout expectations (same as the reference): DiT safetensors in
``model_path``, T5 in ``models_t5_umt5-xxl-enc-bf16.pth``, VAE in
``Wan2.1_VAE.pth``; if ``config.synthetic_weights`` is set, randomly
initialized weights of the configured architecture are used instead (CI /
benchmarks without checkpoints).
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.wan.config import WanArch, arch_from_config
from ..models.wan.pipeline import make_denoise_fn
from ..models.wan.weights import init_random_weight_dict, load_wan_params
from ..encoders.t5 import T5Config, UMT5_XXL, T5EncoderModel, init_random_t5_state_dict, load_t5_params, t5_encode
from ..schedulers.step_distill import WanStepDistillScheduler
from ..schedulers.unipc import WanUniPCScheduler
from ..utils.logging_utils import logger
from ..utils.registry import RUNNER_REGISTER
from ..vae.wan_vae import (
    WanVAEConfig,
    init_random_vae_state_dict,
    load_wan_vae_from_path,
    load_wan_vae_params,
    vae_decode,
    vae_encode,
)
from ..parallel.mesh import build_mesh
from .base_runner import DefaultRunner


class _SyntheticTokenizer:
    """Deterministic hash tokenizer used when no HF tokenizer files are
    available (synthetic-weights mode)."""

    def __init__(self, seq_len: int, vocab_size: int):
        self.seq_len = seq_len
        self.vocab_size = vocab_size

    def __call__(self, texts, return_mask=False, **kw):
        if isinstance(texts, str):
            texts = [texts]
        ids = np.zeros((len(texts), self.seq_len), np.int32)
        mask = np.zeros((len(texts), self.seq_len), np.int32)
        for i, t in enumerate(texts):
            toks = [(hash(w) % (self.vocab_size - 2)) + 2 for w in t.split()][: self.seq_len - 1]
            toks = toks + [1]  # eos
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return (ids, mask) if return_mask else ids


@RUNNER_REGISTER.register("wan2.1")
class WanRunner(DefaultRunner):
    scheduler_cls = WanUniPCScheduler

    # ---------------- component loading ----------------
    def load_transformer(self):
        if self.config.get("synthetic_weights"):
            # small but structurally faithful default arch for checkpoint-free
            # runs (text_dim matches the synthetic T5 encoder)
            for k, v in dict(dim=384, ffn_dim=768, num_heads=6, num_layers=4,
                             freq_dim=256, text_dim=256).items():
                self.config.setdefault(k, v)
        self.arch = arch_from_config(self.config)
        mm_type = self.config.get("mm_config", {}).get("mm_type", "Default") if self.config.get("mm_config") else "Default"
        self.mm_type = mm_type
        lazy_path = self.config.get("dit_quantized_ckpt") or self.config.get("model_path")
        if self.config.get("lazy_load") and lazy_path:
            from ..models.wan.lazy_offload import LazyBlockStore, is_blocks_layout

            if is_blocks_layout(lazy_path):
                if self.arch.rope_fused:
                    # the fused-rope kernel needs half-split-permuted q/k
                    # weights (permute_qk_half), which the per-block lazy
                    # reader doesn't apply — running fused rope on
                    # unpermuted weights silently corrupts every frame.
                    # Fall back to the XLA rope pass (~3% slower; this is
                    # the memory-constrained tier anyway).
                    import dataclasses

                    logger.warning("lazy_load blocks layout: disabling rope_fused "
                                   "(per-block streaming does not permute q/k)")
                    self.arch = dataclasses.replace(self.arch, rope_fused=False)
                # disk tier: only pre/post weights go resident; blocks
                # stream from their per-block files at denoise time
                self._lazy_store = LazyBlockStore(lazy_path, self.arch)
                return dict(self._lazy_store.small)
        if self.config.get("synthetic_weights"):
            wd = init_random_weight_dict(self.arch, seed=0, scale=0.02)
            params = load_wan_params(wd, self.arch)
            if self.arch.rope_fused:
                from ..models.wan.weights import permute_qk_half

                params = permute_qk_half(params, self.arch)
            return params
        from ..utils.safetensors_io import load_file, load_sharded

        path = self.config.get("dit_quantized_ckpt") or self.config["model_path"]
        weights = load_sharded(path)
        # fold LoRAs into raw weights before building the pytree
        # (reference lora_adapter.py:9-131 applies then re-inits weights)
        for lc in self.config.get("lora_configs") or []:
            from ..tools.convert import apply_lora

            apply_lora(weights, load_file(lc["path"]), float(lc.get("strength", 1.0)))
        params = load_wan_params(weights, self.arch)
        if self.arch.rope_fused:
            from ..models.wan.weights import permute_qk_half

            params = permute_qk_half(params, self.arch)
        return params

    def load_text_encoder(self):
        text_len = int(self.config.get("text_len", 512))
        if self.config.get("synthetic_weights"):
            cfg = T5Config(vocab_size=4096, dim=256, dim_attn=256, dim_ffn=512,
                           num_heads=8, num_layers=2)
            # text_dim of the DiT must match the encoder dim in synthetic mode
            params = load_t5_params(init_random_t5_state_dict(cfg, seed=1), cfg)
            enc = T5EncoderModel(text_len, cfg=cfg, params=params)
            enc.tokenizer = _SyntheticTokenizer(text_len, cfg.vocab_size)
            return enc
        ckpt = os.path.join(self.config["model_path"], "models_t5_umt5-xxl-enc-bf16.pth")
        tok = os.path.join(self.config["model_path"], "google", "umt5-xxl")
        if not os.path.isdir(tok):
            tok = "google/umt5-xxl"
        enc = T5EncoderModel(int(self.config.get("text_len", 512)), checkpoint_path=ckpt, tokenizer_path=tok)
        if self.config.get("t5_quantized"):
            # reference wan_runner.py:93-100 loads a pre-quantized t5 ckpt;
            # here weights are quantized at load (same w8a8 kernels)
            from ..encoders.t5 import quantize_t5_params

            scheme = "int8" if "int8" in str(self.config.get("t5_quant_scheme", "int8")) else "fp8"
            enc.params = quantize_t5_params(enc.params, scheme)
        return enc

    def load_image_encoder(self):
        if self.config.get("task") != "i2v":
            return None
        if self.config.get("synthetic_weights"):
            return "synthetic"
        from ..encoders.clip import CLIPVisionModel

        ckpt = os.path.join(self.config["model_path"], "models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth")
        model = CLIPVisionModel(checkpoint_path=ckpt)
        if self.config.get("clip_quantized"):  # reference wan_runner.py:56-78
            from ..encoders.clip import quantize_clip_params

            scheme = "int8" if "int8" in str(self.config.get("clip_quant_scheme", "int8")) else "fp8"
            model.params = quantize_clip_params(model.params, scheme)
        return model

    def load_vae(self):
        if self.config.get("tiny_vae"):
            # taew2_1 fast approximate decoder (reference wan_runner.py:143-152)
            from ..vae.tiny_vae import init_random_tiny_vae_params, load_tiny_vae_params

            self.vae_cfg = None
            if self.config.get("synthetic_weights") or not self.config.get("tiny_vae_path"):
                return init_random_tiny_vae_params(seed=2)
            return load_tiny_vae_params(self.config["tiny_vae_path"])
        if self.config.get("synthetic_weights"):
            cfg = WanVAEConfig(dim=16, z_dim=16, dim_mult=(1, 2, 2, 2), num_res_blocks=1)
            self.vae_cfg = cfg
            params = load_wan_vae_params(init_random_vae_state_dict(cfg, seed=2), cfg)
        else:
            self.vae_cfg = WanVAEConfig()
            params = load_wan_vae_from_path(
                os.path.join(self.config["model_path"], "Wan2.1_VAE.pth"), self.vae_cfg)
        if self.config.get("vae_int8"):
            # int8 decoder convs on the MXU (2x bf16 conv throughput); a
            # TPU-native speed/quality trade with no reference analog —
            # quality bound measured by the fidelity ladder's vae-int8 rung
            from ..vae.wan_vae import quantize_vae_decoder_int8

            params = quantize_vae_decoder_int8(params)
        return params

    # ---------------- pipeline stages ----------------
    def set_target_shape(self):
        """(C, F, H, W) latent shape (reference wan_runner.py:260-280).

        ``shape_bucketing: true`` rounds the latent dims up to a coarse
        grid (F to 4, H/W to 8 latents = 64 px) so a serving process
        compiles a handful of programs instead of one per request shape —
        everything under jit keys on static shapes. The decoded video is
        cropped back to the requested size in run_vae_decoder."""
        cfg = self.config
        st, sh, sw = cfg.get("vae_stride", (4, 8, 8))
        frames = int(cfg.get("target_video_length", 81))
        h, w = int(cfg.get("target_height", 480)), int(cfg.get("target_width", 832))
        lat_f = (frames - 1) // st + 1
        lat_h, lat_w = h // sh, w // sw
        self.config.pop("crop_output", None)
        if cfg.get("shape_bucketing"):
            up = lambda v, q: -(-v // q) * q
            bf, bh, bw = up(lat_f, 4), up(lat_h, 8), up(lat_w, 8)
            if (bf, bh, bw) != (lat_f, lat_h, lat_w):
                self.config["crop_output"] = (frames, h, w)
                lat_f, lat_h, lat_w = bf, bh, bw
        self.config["target_shape"] = (16, lat_f, lat_h, lat_w)
        return self.config["target_shape"]

    def init_scheduler(self):
        return self.scheduler_cls(self.config)

    def run_input_encoder(self) -> Dict[str, Any]:
        prompt = self.config.get("prompt", "")
        if self.config.get("use_prompt_enhancer") and self.config.get("prompt_enhancer_url"):
            from ..utils.prompt_enhancer import enhance_via_service

            enhanced = enhance_via_service(prompt, self.config["prompt_enhancer_url"])
            if enhanced:
                prompt = enhanced
        neg = self.config.get("negative_prompt", "") or ""
        context = self.text_encoder.infer([prompt])
        context_null = self.text_encoder.infer([neg]) if self.config.get("enable_cfg", True) else context
        out: Dict[str, Any] = {
            "text_encoder_output": {"context": context, "context_null": context_null},
            "image_encoder_output": None,
        }
        if self.config.get("task") == "i2v" and self.config.get("image_path"):
            out["image_encoder_output"] = self.run_image_encoder(self.config["image_path"])
        return out

    def run_image_encoder(self, image_path: str) -> Dict[str, Any]:
        """i2v conditioning: CLIP tokens + VAE-encoded first frame with a
        4x-repeated-first-frame mask (reference wan_runner.py:204-248)."""
        from ..utils.media import load_image

        img = load_image(image_path)  # (H, W, 3) in [-1, 1]
        cfg = self.config
        h, w = int(cfg.get("target_height", 480)), int(cfg.get("target_width", 832))
        import cv2

        img_r = cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)
        frames = int(cfg.get("target_video_length", 81))
        lat_f = (frames - 1) // 4 + 1

        if self.config.get("synthetic_weights"):
            clip_out = jnp.zeros((1, 257, self.arch.clip_dim), jnp.float32)
        else:
            clip_out = self.image_encoder.infer(img_r)

        # VAE-encode [first_frame, zeros x (frames-1)]
        vid = np.zeros((1, frames, h, w, 3), np.float32)
        vid[0, 0] = img_r
        z = vae_encode(self.vae, jnp.asarray(vid), self.vae_cfg)  # (1, lat_f, h/8, w/8, z)
        z = jnp.transpose(z[0], (3, 0, 1, 2))  # (z, lat_f, h', w')
        # mask: 1 for the (4x-repeated) first frame, 0 elsewhere
        lat_h, lat_w = h // 8, w // 8
        msk = np.zeros((4, lat_f, lat_h, lat_w), np.float32)
        msk[:, 0] = 1.0
        y = jnp.concatenate([jnp.asarray(msk), z], axis=0)  # (4+z, lat_f, h', w')
        return {"clip_encoder_out": clip_out, "vae_encode_out": y[None]}

    def run_dit(self, encoder_out: Dict[str, Any]):
        if self.config.get("do_mm_calib"):
            # reference: mm_type="Calib" records act stats during a normal
            # run (transformer_weights.py:20); here one eager calibration
            # pass collects named per-block stats, saved for
            # tools/convert.py --calib_stats (advanced_ptq production)
            self._collect_calib_stats(encoder_out)
        if self.config.get("changing_resolution"):
            return self._run_dit_changing_resolution(encoder_out)
        if self.config.get("weight_streaming") or self.config.get("cpu_offload") \
                or self.config.get("lazy_load"):
            # reference parity: cpu_offload selects the block-offload path,
            # lazy_load adds the disk tier (set_config.py defaults).
            # Every caching mode and sparge compose with streaming (the
            # reference combines them freely, feature_caching/
            # transformer_infer.py + offload/manager.py); only mesh_shape
            # still requires the resident path — say so instead of
            # silently running
            if self.config.get("mesh_shape"):
                logger.warning("streamed (offload) path ignores mesh_shape — "
                               "multi-chip sharding requires the resident path")
            return self._run_dit_streamed(encoder_out)
        target_shape = self.set_target_shape()
        scheduler = self.init_scheduler()
        self.scheduler = scheduler
        state = scheduler.prepare(target_shape, int(self.config.get("seed", 42)))

        mesh = None
        sp_size = 1
        if self.config.get("mesh_shape"):
            mesh = build_mesh(dict(self.config["mesh_shape"]),
                              devices=self._mesh_devices())
            sp_size = dict(self.config["mesh_shape"]).get("sp", 1)

        attn_default, cross_attn, self_attn_kwargs = self._self_attn_setup()
        if attn_default == "radial_attn":
            from ..ops.radial import MaskMap

            pt, ph, pw = self.arch.patch_size
            gf = target_shape[1] // pt
            vid_tokens = gf * (target_shape[2] // ph) * (target_shape[3] // pw)
            self_attn_kwargs = {
                "mask_map": MaskMap(video_token_num=vid_tokens, num_frame=gf),
                "decay_factor": float(self.config.get("decay_factor", 0.5)),
                "block_q": int(self.config.get("sparse_block_q", 2048)),
                "block_k": int(self.config.get("sparse_block_k", 1024)),
            }
        denoise = make_denoise_fn(
            self.arch, scheduler, target_shape,
            enable_cfg=bool(self.config.get("enable_cfg", True)),
            guide_scale=float(self.config.get("sample_guide_scale", 5.0)),
            mm_type=self.mm_type,
            self_attn_type=attn_default,
            cross_attn_type=cross_attn,
            mesh=mesh,
            sp_size=sp_size,
            cfg_scale_embed=(float(self.config.get("cfg_scale", 4.0))
                             if self.config.get("enable_dynamic_cfg") else None),
            feature_caching=self.config.get("feature_caching", "NoCaching"),
            caching_config=self.config,
            self_attn_kwargs=self_attn_kwargs,
            parallel_attn_type=self.config.get("parallel_attn_type") or "ulysses",
        )
        teo = encoder_out["text_encoder_output"]
        ieo = encoder_out.get("image_encoder_output")
        y = clip_fea = None
        if ieo is not None:
            y = ieo["vae_encode_out"]
            clip_fea = ieo["clip_encoder_out"]
        state = denoise(self.model, state, teo["context"], teo["context_null"], y, clip_fea)

        if self.progress_callback:
            self.progress_callback(scheduler.num_steps(), scheduler.num_steps())
        return state["latents"]

    def _run_dit_changing_resolution(self, encoder_out: Dict[str, Any]):
        """Two-phase denoise: low resolution for the first half, then
        x0-predict -> trilinear upsample -> re-noise -> continue at full
        resolution with shift+2 (reference wan/changing_resolution/
        scheduler.py:32-66)."""
        from ..models.wan.model import wan_forward, wan_forward_cfg
        from ..models.wan.pipeline import rope_for_shape

        cfg = self.config
        target = self.set_target_shape()
        c, f_, h, w = target
        rate = float(cfg.get("resolution_rate", 0.75))
        n = int(cfg.infer_steps)
        k = int(cfg.get("changing_resolution_steps", n // 2))
        low = (c, f_, int(h * rate) // 2 * 2, int(w * rate) // 2 * 2)
        seed = int(cfg.get("seed", 42))
        enable_cfg = bool(cfg.get("enable_cfg", True))
        guide = float(cfg.get("sample_guide_scale", 5.0))
        attn = cfg.get("attention_impl") or cfg.get("self_attn_1_type", "flash_attn3")
        teo = encoder_out["text_encoder_output"]
        ctx, ctx_null = teo["context"], teo["context_null"]

        # phase A: steps 0..k-1 at low resolution
        sched_a = self.scheduler_cls(cfg)
        self.scheduler = sched_a
        state = sched_a.prepare(low, seed)
        denoise_a = make_denoise_fn(self.arch, sched_a, low, enable_cfg=enable_cfg,
                                    guide_scale=guide, mm_type=self.mm_type,
                                    self_attn_type=attn, cross_attn_type=attn, num_steps=k)
        state = denoise_a(self.model, state, ctx, ctx_null)

        # boundary step k: forward at low res, x0-predict, upsample, re-noise
        cos, sin, _ = rope_for_shape(self.arch, low)
        lat, t = sched_a.step_pre(state)
        if enable_cfg:
            pred = wan_forward_cfg(self.model, lat[None], t[None].astype(jnp.float32),
                                   ctx, ctx_null, guide, cos, sin, self.arch,
                                   self_attn_type=attn, cross_attn_type=attn)[0]
        else:
            pred = wan_forward(self.model, lat[None], t[None].astype(jnp.float32), ctx,
                               cos, sin, self.arch, self_attn_type=attn, cross_attn_type=attn)[0]
        sig_k = float(sched_a.sigmas[k])
        x0 = state["latents"].astype(jnp.float32) - sig_k * pred.astype(jnp.float32)
        clean = jax.image.resize(x0, target, method="trilinear")
        noise_full = jax.random.normal(jax.random.PRNGKey(seed + 101), target, jnp.float32)
        noisy = (1.0 - sig_k) * clean + sig_k * noise_full

        # phase B: steps k+1..n-1 at full resolution with shift+2 and a
        # fresh multistep history
        sched_b = self.scheduler_cls(cfg)
        self.scheduler = sched_b
        state_b = sched_b.prepare(target, seed + 1, shift=float(cfg.sample_shift) + 2.0,
                                  start_step=k + 1)
        state_b["latents"] = noisy
        state_b["step_index"] = jnp.asarray(k + 1, jnp.int32)
        denoise_b = make_denoise_fn(self.arch, sched_b, target, enable_cfg=enable_cfg,
                                    guide_scale=guide, mm_type=self.mm_type,
                                    self_attn_type=attn, cross_attn_type=attn,
                                    num_steps=n - (k + 1))
        state_b = denoise_b(self.model, state_b, ctx, ctx_null)
        return state_b["latents"]

    def _collect_calib_stats(self, encoder_out: Dict[str, Any]) -> None:
        """One eager calibration forward at the first timestep; stats land
        in ``calib_output_path`` (default: calib_stats.npz) for the
        converter's smooth-quant path."""
        from ..models.wan.pipeline import rope_for_shape
        from ..tools.calibrate import collect_block_stats, save_stats

        cfg = self.config
        target_shape = self.set_target_shape()
        scheduler = self.init_scheduler()
        state = scheduler.prepare(target_shape, int(cfg.get("seed", 42)))
        rope_cos, rope_sin, _ = rope_for_shape(self.arch, target_shape)
        lat, t = scheduler.step_pre(state)
        teo = encoder_out["text_encoder_output"]
        ieo = encoder_out.get("image_encoder_output") or {}
        stats = collect_block_stats(
            self.model, self.arch, lat[None], t[None].astype(jnp.float32),
            teo["context"], rope_cos, rope_sin,
            y=ieo.get("vae_encode_out"), clip_fea=ieo.get("clip_encoder_out"),
            self_attn_type=cfg.get("self_attn_1_type", "xla"))
        out_path = cfg.get("calib_output_path", "calib_stats.npz")
        save_stats(stats, out_path)
        logger.info(f"calibration stats written to {out_path}")

    def _self_attn_setup(self):
        """Resolve (self_attn_type, cross_attn_type, self_attn_kwargs) from
        config — shared by the resident and streamed paths. The reference
        gates sparge per-block on config["sparge"] and loads tuned
        (l1, pv_l1) from sparge_ckpt (transformer_weights.py:183-190); the
        TPU meansim analog (ops/sparge.py) needs no checkpoint."""
        attn_default = self.config.get("attention_impl") or self.config.get("self_attn_1_type", "flash_attn3")
        if self.config.get("sparge"):
            attn_default = "sparge"
        cross_attn = self.config.get("cross_attn_1_type", attn_default)
        if cross_attn in ("radial_attn", "sparge"):
            cross_attn = "flash_attn3"  # sparse masks apply to video self-attn only
        self_attn_kwargs = None
        if attn_default == "sparge":
            self_attn_kwargs = {
                "keep_ratio": float(self.config.get("sparge_keep_ratio", 0.3)),
                "l1": float(self.config.get("sparge_l1", 0.07)),
                "block_q": int(self.config.get("sparse_block_q", 2048)),
                "block_k": int(self.config.get("sparse_block_k", 1024)),
            }
            # per-layer tuned budgets, the reference's sparge_ckpt analog:
            # either an inline list or an .npz with an "l1" (L,) array
            per_layer = self.config.get("sparge_l1_per_layer")
            table_passed = None
            if not per_layer and self.config.get("sparge_ckpt"):
                import numpy as _np

                table = _np.load(self.config["sparge_ckpt"])
                per_layer = table["l1"]
                if "passed" in table:
                    table_passed = table["passed"]
            if per_layer is not None:
                per_layer = list(map(float, per_layer))
                assert len(per_layer) == self.arch.num_layers, (
                    f"sparge l1 table has {len(per_layer)} entries, "
                    f"model has {self.arch.num_layers} layers")
                self_attn_kwargs["l1_per_layer"] = per_layer
            # layers the tuner could not sparsify within the keep cap run
            # DENSE via a segmented scan (model.wan_transformer
            # dense_prefix). Auto: the table's leading failed run;
            # override with config sparge_dense_prefix (0 disables).
            dense_prefix = self.config.get("sparge_dense_prefix")
            if dense_prefix is None and table_passed is not None:
                dense_prefix = 0
                for ok in table_passed:
                    if ok:
                        break
                    dense_prefix += 1
                if not table_passed[dense_prefix:].all():
                    from ..utils.logging_utils import logger

                    logger.warning(
                        "sparge table has non-leading failed layers; only a "
                        "leading dense prefix is supported — mid-stack "
                        "failures run at their table l1 (densest-in-cap)")
            if dense_prefix:
                self_attn_kwargs["dense_prefix"] = int(dense_prefix)
        return attn_default, cross_attn, self_attn_kwargs

    def _run_dit_streamed(self, encoder_out: Dict[str, Any]):
        """Weight streaming for over-HBM models (the reference's offload
        tiers). Two modes:

        * ``cpu_offload`` (host-RAM tier): blocks stay in host RAM, device
          holds two blocks + activations (models/wan/streaming.py);
        * ``lazy_load`` (disk tier): per-block safetensors files + N disk
          prefetch threads filling a bounded host buffer — host RAM stays
          below model size (models/wan/lazy_offload.py; reference
          LazyWeightAsyncStreamManager, manager.py:59-386).

        CFG runs batched (cond/uncond in one pass) so the weights stream
        ONCE per step — half the disk/PCIe traffic of the reference's
        sequential double pass.

        Composes with EVERY caching mode (Tea / TaylorSeer / Ada /
        Custom) and sparge: a skipped step applies the host-staged
        whole-stack reconstruction and FETCHES NO BLOCKS — the streaming
        analog of the reference's caching x offload composition
        (feature_caching/transformer_infer.py under offload/manager.py).
        Taylor-family modes keep a first-order (f0, f1) state of the
        whole-stack residual rather than the reference's per-module
        caches — streaming per-module caches would cost more transfer
        than the weights themselves (see streaming.py module docstring
        for the arithmetic)."""
        from ..models.wan.pipeline import rope_for_shape
        from ..models.wan.streaming import make_streamed_forward, split_blocks_to_host

        cfg = self.config
        target_shape = self.set_target_shape()
        scheduler = self.init_scheduler()
        self.scheduler = scheduler
        state = scheduler.prepare(target_shape, int(cfg.get("seed", 42)))
        rope_cos, rope_sin, _ = rope_for_shape(self.arch, target_shape)
        attn, cross_attn, self_attn_kwargs = self._self_attn_setup()
        fwd = make_streamed_forward(self.arch, mm_type=self.mm_type,
                                    self_attn_type=attn, cross_attn_type=cross_attn,
                                    self_attn_kwargs=self_attn_kwargs)

        tea = taylor = ada = None
        fc = cfg.get("feature_caching", "NoCaching")
        if fc in ("Tea", "Custom"):
            from ..caching.teacache import TeaCacheConfig

            tea = {"cfg": TeaCacheConfig.from_config(cfg), "state": None, "skipped": 0}
            self._tea_stats = tea  # observability (tests, profiling)
        if fc in ("TaylorSeer", "Custom"):
            from ..caching.taylorseer import taylor_schedule

            is_calc, _ = taylor_schedule(scheduler.num_steps(),
                                         int(cfg.get("taylor_pattern", 4)))
            dt_name = str(cfg.get("taylor_cache_dtype", "bf16")).lower()
            taylor = {"is_calc": is_calc, "f0": None, "f1": None, "last_calc": 0,
                      "skipped": 0, "step": 0,
                      "dtype": {"bf16": jnp.bfloat16, "fp8": jnp.float8_e4m3fn,
                                "fp32": jnp.float32}[dt_name]}
            self._taylor_stats = taylor
        if fc == "Ada":
            from ..caching.adacache import init_ada_state

            pt = self.arch.patch_size
            grid_f = max(target_shape[1] // pt[0], 1)
            s_tok = (grid_f * (target_shape[2] // pt[1])
                     * (target_shape[3] // pt[2]))
            batch = 2 if cfg.get("enable_cfg", True) else 1
            ada = {"state": init_ada_state(
                       (batch, s_tok, self.arch.dim),
                       metric_scale=float(cfg.get("ada_metric_scale", 1.0))),
                   "skip_until": 0, "skipped": 0, "step": 0,
                   "n_steps": scheduler.num_steps(),
                   "tokens_per_frame": s_tok // grid_f}
            self._ada_stats = ada

        prefetcher = None
        if cfg.get("lazy_load"):
            from ..models.wan.lazy_offload import BlockPrefetcher, LazyBlockStore

            store = getattr(self, "_lazy_store", None)
            if store is None:
                ckpt = cfg.get("dit_quantized_ckpt") or cfg["model_path"]
                store = LazyBlockStore(ckpt, self.arch)
            max_bytes = cfg.get("max_memory")  # GB, reference manager.py key
            prefetcher = BlockPrefetcher(
                store,
                num_workers=int(cfg.get("num_disk_workers", 2)),
                max_host_bytes=int(float(max_bytes) * (1 << 30)) if max_bytes else None,
            )
            host_params = dict(store.small)
            host_params["blocks"] = prefetcher
        else:
            host_params = split_blocks_to_host(self.model)

        teo = encoder_out["text_encoder_output"]
        ieo = encoder_out.get("image_encoder_output")
        y = clip_fea = None
        if ieo is not None:
            y = ieo["vae_encode_out"]
            clip_fea = ieo["clip_encoder_out"]
        enable_cfg = bool(cfg.get("enable_cfg", True))
        guide = float(cfg.get("sample_guide_scale", 5.0))

        try:
            for step in range(scheduler.num_steps()):
                for c in (tea, taylor, ada):
                    if c is not None:
                        c["step"] = step
                lat, t = scheduler.step_pre(state)
                lat_b, tb = lat[None], t[None].astype(jnp.float32)
                if enable_cfg:
                    lat2 = jnp.concatenate([lat_b, lat_b], axis=0)
                    t2 = jnp.concatenate([tb, tb], axis=0)
                    ctx2 = jnp.concatenate([teo["context"], teo["context_null"]], axis=0)
                    y2 = None if y is None else jnp.concatenate([y, y], axis=0)
                    c2 = None if clip_fea is None else jnp.concatenate([clip_fea, clip_fea], axis=0)
                    out = fwd(host_params, lat2, t2, ctx2, rope_cos, rope_sin, y=y2, clip_fea=c2,
                              tea=tea, taylor=taylor, ada=ada)
                    pred = out[1] + guide * (out[0] - out[1])
                else:
                    pred = fwd(host_params, lat_b, tb, teo["context"], rope_cos, rope_sin,
                               y=y, clip_fea=clip_fea, tea=tea, taylor=taylor, ada=ada)[0]
                state = scheduler.step_post(state, pred)
            skipped = next((c for c in (taylor, ada, tea) if c is not None and c["skipped"]), None)
            if skipped is not None:
                logger.info(f"{fc}(streamed): skipped {skipped['skipped']}/"
                            f"{scheduler.num_steps()} steps (no block fetches on skips)")
        finally:
            if prefetcher is not None:
                prefetcher.close()
        return state["latents"]

    def _crop_to_request(self, frames: np.ndarray) -> np.ndarray:
        """Crop a shape-bucketed generation back to the requested
        (frames, h, w) — center crop spatially, head crop temporally."""
        crop = self.config.get("crop_output")
        if not crop:
            return frames
        f, h, w = crop
        oh, ow = frames.shape[1], frames.shape[2]
        y0, x0 = max(0, (oh - h) // 2), max(0, (ow - w) // 2)
        return frames[:f, y0:y0 + h, x0:x0 + w]

    def run_vae_decoder(self, latents) -> np.ndarray:
        if self.config.get("tiny_vae"):
            from ..vae.tiny_vae import tiny_decode_wan_latents

            frames = tiny_decode_wan_latents(self.vae, latents)
            return self._crop_to_request(np.clip(np.asarray(frames, np.float32), -1.0, 1.0))
        # latents (C, F, H, W) -> VAE layout (B, F, H, W, C)
        z = jnp.transpose(latents, (1, 2, 3, 0))[None]
        scale = not self.config.get("synthetic_weights")
        if self.config.get("parallel_vae") and self.config.get("mesh_shape"):
            from ..parallel.vae_parallel import parallel_vae_decode

            mesh = build_mesh(dict(self.config["mesh_shape"]),
                              devices=self._mesh_devices())
            frames = parallel_vae_decode(self.vae, z, self.vae_cfg, mesh, scale=scale)
        else:
            # one compiled program for the whole decode (eager decode
            # dispatches every conv separately and loses cross-op fusion)
            chunk = int(self.config.get("vae_decode_chunk", 4))
            key = ("_jit_decode", bool(self.config.get("use_tiling_vae")), scale, chunk)
            if getattr(self, "_jit_decode_key", None) != key:
                from ..vae.wan_vae import make_jitted_decode

                self._jit_decode = make_jitted_decode(
                    self.vae, self.vae_cfg, tiled=key[1], scale=scale, chunk=chunk)
                self._jit_decode_key = key
            frames = self._jit_decode(z)
        return self._crop_to_request(np.clip(np.asarray(frames[0], np.float32), -1.0, 1.0))


@RUNNER_REGISTER.register("wan2.1_distill")
class WanDistillRunner(WanRunner):
    """4-step step+CFG-distilled model (reference wan_distill_runner.py)."""

    scheduler_cls = WanStepDistillScheduler

    def init_scheduler(self):
        if "denoising_step_list" not in self.config:
            self.config["denoising_step_list"] = [1000, 750, 500, 250]
        self.config["infer_steps"] = len(self.config["denoising_step_list"])
        return self.scheduler_cls(self.config)
