"""Wan DiT forward: shape checks + fp64 torch oracle parity.

The oracle re-implements the reference pipeline (patch conv3d, fp64 RoPE
complex multiply, AdaLN blocks, head) directly from the architecture
definition, entirely in torch fp64 — an independent check that the scanned
JAX implementation computes the same function.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from lightx2v_tpu.models.wan.config import WanArch
from lightx2v_tpu.models.wan.model import patchify, unpatchify, wan_forward, wan_forward_cfg
from lightx2v_tpu.models.wan.weights import init_random_weight_dict, load_wan_params
from lightx2v_tpu.ops.rope import build_wan_rope_grid

TINY = WanArch(dim=96, ffn_dim=128, num_heads=4, num_layers=2, in_dim=4, out_dim=4,
               freq_dim=32, text_len=16, text_dim=24, clip_dim=20)


def torch_rope_apply(x, grid, head_dim, start_frame=0):
    """fp64 complex RoPE exactly as the reference (wan/infer/utils.py:107-158)."""
    f, h, w = grid
    d = head_dim
    def rp(L, dim):
        fr = torch.outer(torch.arange(L), 1.0 / torch.pow(10000, torch.arange(0, dim, 2).double() / dim))
        return torch.polar(torch.ones_like(fr), fr)
    ft = rp(1024, d - 4 * (d // 6))[start_frame:start_frame + f]
    fh = rp(1024, 2 * (d // 6))[:h]
    fw = rp(1024, 2 * (d // 6))[:w]
    freqs = torch.cat([
        ft.view(f, 1, 1, -1).expand(f, h, w, -1),
        fh.view(1, h, 1, -1).expand(f, h, w, -1),
        fw.view(1, 1, w, -1).expand(f, h, w, -1),
    ], dim=-1).reshape(f * h * w, 1, -1)
    s, n = x.shape[0], x.shape[1]
    xc = torch.view_as_complex(x.double().reshape(s, n, -1, 2))
    return torch.view_as_real(xc * freqs).flatten(2)


def torch_wan_forward(wd, arch: WanArch, latents, t, context, clip_fea=None, y=None):
    """Independent fp64 implementation of the Wan DiT forward."""
    td = {k: torch.from_numpy(np.asarray(v, np.float64)) for k, v in wd.items()}
    lin = lambda p, v: v @ td[p + ".weight"].T + td[p + ".bias"]
    x = torch.from_numpy(np.asarray(latents, np.float64))
    if y is not None:
        x = torch.cat([x, torch.from_numpy(np.asarray(y, np.float64))], dim=1)
    B = x.shape[0]
    xe = F.conv3d(x, td["patch_embedding.weight"], td["patch_embedding.bias"], stride=arch.patch_size)
    grid = tuple(xe.shape[2:])
    x = xe.flatten(2).transpose(1, 2)  # (B, S, D)
    S = x.shape[1]

    # timestep embedding
    half = arch.freq_dim // 2
    pos = torch.from_numpy(np.asarray(t, np.float64))
    sinus = torch.outer(pos, torch.pow(torch.tensor(10000.0, dtype=torch.float64), -torch.arange(half).double() / half))
    emb = torch.cat([torch.cos(sinus), torch.sin(sinus)], dim=1)
    e = F.silu(lin("time_embedding.0", emb))
    embed = lin("time_embedding.2", e)
    embed0 = lin("time_projection.1", F.silu(embed)).reshape(B, 6, arch.dim)

    # text embedding
    ctx = torch.from_numpy(np.asarray(context, np.float64))
    ctx = lin("text_embedding.2", F.gelu(lin("text_embedding.0", ctx), approximate="tanh"))

    ctx_img = None
    if clip_fea is not None:
        ci = torch.from_numpy(np.asarray(clip_fea, np.float64))
        ci = F.layer_norm(ci, (arch.clip_dim,), td["img_emb.proj.0.weight"], td["img_emb.proj.0.bias"])
        ci = F.gelu(lin("img_emb.proj.1", ci), approximate="none")
        ci = lin("img_emb.proj.3", ci)
        ctx_img = F.layer_norm(ci, (arch.dim,), td["img_emb.proj.4.weight"], td["img_emb.proj.4.bias"])

    n, hd = arch.num_heads, arch.head_dim
    rms = lambda v, wt: v / torch.sqrt((v * v).mean(-1, keepdim=True) + 1e-5) * wt
    ln = lambda v: F.layer_norm(v, (arch.dim,), eps=arch.eps)

    def attn(q, k, v):
        # (S, N, D) x (L, N, D)
        logits = torch.einsum("qnd,knd->nqk", q, k) / np.sqrt(hd)
        p = torch.softmax(logits, dim=-1)
        return torch.einsum("nqk,knd->qnd", p, v).reshape(q.shape[0], -1)

    for b in range(B):
        xb = x[b]
        for i in range(arch.num_layers):
            pfx = f"blocks.{i}"
            e6 = (td[f"{pfx}.modulation"].squeeze(0) + embed0[b]).chunk(6, dim=0)
            shift, scale, gate, c_shift, c_scale, c_gate = [c for c in e6]
            h1 = ln(xb) * (1 + scale) + shift
            q = rms(lin(f"{pfx}.self_attn.q", h1), td[f"{pfx}.self_attn.norm_q.weight"]).view(S, n, hd)
            k = rms(lin(f"{pfx}.self_attn.k", h1), td[f"{pfx}.self_attn.norm_k.weight"]).view(S, n, hd)
            v = lin(f"{pfx}.self_attn.v", h1).view(S, n, hd)
            q = torch_rope_apply(q, grid, hd).view(S, n, hd)
            k = torch_rope_apply(k, grid, hd).view(S, n, hd)
            y_sa = lin(f"{pfx}.self_attn.o", attn(q, k, v))
            xb = xb + y_sa * gate
            h3 = F.layer_norm(xb, (arch.dim,), td[f"{pfx}.norm3.weight"], td[f"{pfx}.norm3.bias"], eps=arch.eps)
            cq = rms(lin(f"{pfx}.cross_attn.q", h3), td[f"{pfx}.cross_attn.norm_q.weight"]).view(S, n, hd)
            ck = rms(lin(f"{pfx}.cross_attn.k", ctx[b]), td[f"{pfx}.cross_attn.norm_k.weight"]).view(-1, n, hd)
            cv = lin(f"{pfx}.cross_attn.v", ctx[b]).view(-1, n, hd)
            ca_out = attn(cq, ck, cv)
            if ctx_img is not None:
                ik = rms(lin(f"{pfx}.cross_attn.k_img", ctx_img[b]), td[f"{pfx}.cross_attn.norm_k_img.weight"]).view(-1, n, hd)
                iv = lin(f"{pfx}.cross_attn.v_img", ctx_img[b]).view(-1, n, hd)
                ca_out = ca_out + attn(cq, ik, iv)
            xb = xb + lin(f"{pfx}.cross_attn.o", ca_out)
            h2 = ln(xb) * (1 + c_scale) + c_shift
            y_ffn = lin(f"{pfx}.ffn.2", F.gelu(lin(f"{pfx}.ffn.0", h2), approximate="tanh"))
            xb = xb + y_ffn * c_gate
        x[b] = xb

    # head
    mod = td["head.modulation"].squeeze(0)  # (2, D)
    e2 = mod.unsqueeze(0) + embed.unsqueeze(1)  # (B, 2, D)
    xh = ln(x) * (1 + e2[:, 1:2]) + e2[:, 0:1]
    out = lin("head.head", xh)
    # unpatchify
    f_, h_, w_ = grid
    pt, ph, pw = arch.patch_size
    c = arch.out_dim
    u = out.reshape(B, f_, h_, w_, pt, ph, pw, c)
    u = torch.einsum("bfhwpqrc->bcfphqwr", u)
    return u.reshape(B, c, f_ * pt, h_ * ph, w_ * pw).numpy()


def make_inputs(arch, B=1, FHW=(4, 6, 8), seed=0, i2v=False):
    rng = np.random.default_rng(seed)
    F_, H, W = FHW
    latents = rng.standard_normal((B, arch.in_dim, F_, H, W)).astype(np.float32)
    t = np.full((B,), 500.0, np.float32)
    context = rng.standard_normal((B, arch.text_len, arch.text_dim)).astype(np.float32)
    return latents, t, context


class TestPatchify:
    def test_roundtrip(self):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 4, 6, 8)), jnp.float32)
        p = patchify(x, (1, 2, 2))
        assert p.shape == (2, 4 * 3 * 4, 3 * 4)

    def test_matches_conv3d(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((1, 4, 2, 4, 6)).astype(np.float32)
        wt = rng.standard_normal((8, 4, 1, 2, 2)).astype(np.float32)
        ref = F.conv3d(torch.from_numpy(x), torch.from_numpy(wt), stride=(1, 2, 2))
        ref = ref.flatten(2).transpose(1, 2).numpy()  # (B, S, D)
        pm = jnp.asarray(wt.reshape(8, -1).T)
        ours = patchify(jnp.asarray(x), (1, 2, 2)) @ pm
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


class TestWanForward:
    @pytest.mark.parametrize("task", ["t2v", "i2v"])
    def test_oracle_parity(self, task):
        arch = TINY if task == "t2v" else WanArch(
            dim=96, ffn_dim=128, num_heads=4, num_layers=2, in_dim=24, out_dim=4,
            freq_dim=32, text_len=16, text_dim=24, clip_dim=20, task="i2v")
        wd = init_random_weight_dict(arch, seed=0, scale=0.05)
        wd = {k: np.asarray(v, np.float32) for k, v in wd.items()}
        params = load_wan_params(wd, arch, compute_dtype=np.float32)

        B, (F_, H, W) = 1, (2, 4, 6)
        rng = np.random.default_rng(7)
        lat_c = 4
        latents = rng.standard_normal((B, lat_c, F_, H, W)).astype(np.float32)
        t = np.asarray([500.0], np.float32)
        context = (rng.standard_normal((B, arch.text_len, arch.text_dim)) * 0.5).astype(np.float32)
        clip_fea = y = None
        if task == "i2v":
            clip_fea = rng.standard_normal((B, 5, arch.clip_dim)).astype(np.float32)
            y = rng.standard_normal((B, arch.in_dim - lat_c, F_, H, W)).astype(np.float32)

        f, h, w = F_ // 1, H // 2, W // 2
        cos, sin = build_wan_rope_grid(arch.head_dim, f, h, w)
        out = wan_forward(
            params, jnp.asarray(latents), jnp.asarray(t), jnp.asarray(context),
            jnp.asarray(cos), jnp.asarray(sin), arch,
            y=None if y is None else jnp.asarray(y),
            clip_fea=None if clip_fea is None else jnp.asarray(clip_fea),
            self_attn_type="xla", cross_attn_type="xla",
        )
        ref = torch_wan_forward(wd, arch, latents, t, context, clip_fea=clip_fea, y=y)
        assert out.shape == ref.shape == (B, arch.out_dim, F_, H, W)
        # bf16 activations inside attention/GEMMs put us at ~1e-2; with fp32
        # weights the only dtype loss is activation casts
        np.testing.assert_allclose(np.asarray(out, np.float32), ref, rtol=0.05, atol=0.05)
        # correlation must be essentially perfect
        c = np.corrcoef(np.asarray(out).ravel(), ref.ravel())[0, 1]
        assert c > 0.999, f"correlation {c}"

    def test_cfg_batched_equals_two_passes(self):
        arch = TINY
        wd = init_random_weight_dict(arch, seed=1, scale=0.05)
        params = load_wan_params(wd, arch)
        latents, t, context = make_inputs(arch, FHW=(2, 4, 6), seed=2)
        context_null = context * 0.5
        cos, sin = build_wan_rope_grid(arch.head_dim, 2, 2, 3)
        args = (jnp.asarray(cos), jnp.asarray(sin), arch)
        out_cfg = wan_forward_cfg(
            params, jnp.asarray(latents), jnp.asarray(t), jnp.asarray(context),
            jnp.asarray(context_null), 5.0, *args, self_attn_type="xla", cross_attn_type="xla")
        cond = wan_forward(params, jnp.asarray(latents), jnp.asarray(t), jnp.asarray(context), *args,
                           self_attn_type="xla", cross_attn_type="xla")
        uncond = wan_forward(params, jnp.asarray(latents), jnp.asarray(t), jnp.asarray(context_null), *args,
                             self_attn_type="xla", cross_attn_type="xla")
        expected = np.asarray(uncond) + 5.0 * (np.asarray(cond) - np.asarray(uncond))
        # batched vs separate passes differ by bf16 rounding amplified by the
        # guidance scale; require tight correlation + small absolute error
        got = np.asarray(out_cfg)
        c = np.corrcoef(got.ravel(), expected.ravel())[0, 1]
        assert c > 0.999, f"correlation {c}"
        np.testing.assert_allclose(got, expected, rtol=0.08, atol=0.03)

    def test_jit_and_seq_pad(self):
        arch = TINY
        wd = init_random_weight_dict(arch, seed=3, scale=0.05)
        params = load_wan_params(wd, arch)
        latents, t, context = make_inputs(arch, FHW=(2, 4, 6), seed=4)
        cos, sin = build_wan_rope_grid(arch.head_dim, 2, 2, 3)

        fwd = jax.jit(
            lambda p, l, tt, c: wan_forward(
                p, l, tt, c, jnp.asarray(cos), jnp.asarray(sin), arch,
                self_attn_type="xla_chunked", cross_attn_type="xla", seq_len=16),
        )
        out = fwd(params, jnp.asarray(latents), jnp.asarray(t), jnp.asarray(context))
        assert out.shape == (1, arch.out_dim, 2, 4, 6)
        assert np.isfinite(np.asarray(out, np.float32)).all()
