"""Host weight streaming (offload analog): output parity with the scanned
in-HBM path."""

import jax.numpy as jnp
import numpy as np

from lightx2v_tpu.models.wan.config import WanArch
from lightx2v_tpu.models.wan.model import wan_forward
from lightx2v_tpu.models.wan.streaming import make_streamed_forward, split_blocks_to_host
from lightx2v_tpu.models.wan.weights import init_random_weight_dict, load_wan_params
from lightx2v_tpu.ops.rope import build_wan_rope_grid

ARCH = WanArch(dim=64, ffn_dim=96, num_heads=4, num_layers=3, in_dim=4, out_dim=4,
               freq_dim=32, text_len=8, text_dim=16)


def test_streamed_matches_scanned():
    params = load_wan_params(init_random_weight_dict(ARCH, seed=0, scale=0.05), ARCH)
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.standard_normal((1, 4, 2, 4, 8)), jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 8, 16)), jnp.float32)
    cos, sin = build_wan_rope_grid(ARCH.head_dim, 2, 2, 4)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    ref = wan_forward(params, latents, t, ctx, cos, sin, ARCH,
                      self_attn_type="xla", cross_attn_type="xla")
    host_params = split_blocks_to_host(params)
    fwd = make_streamed_forward(ARCH, self_attn_type="xla", cross_attn_type="xla")
    out = fwd(host_params, latents, t, ctx, cos, sin)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)
