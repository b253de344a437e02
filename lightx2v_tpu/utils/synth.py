"""Device-side synthetic parameter generation.

``device_randn_like(tree)`` replaces every array leaf of a host pytree
with an accelerator-generated random array of the same shape/dtype,
matching each leaf's host mean/std (so e.g. norm gammas stay ~1). One
jitted program generates everything — nothing crosses host->device.

Why: benchmark chips reached through a tunnel move host->device at
single-digit MB/s; even a 250 MB VAE upload would dominate an e2e
measurement, and 14B DiT weights could never ship at all (see
models/wan/weights.init_random_params_on_device for the DiT's
scheme-aware equivalent).
"""

from __future__ import annotations

from typing import Any

import numpy as np


def device_randn_like(tree: Any, seed: int = 0) -> Any:
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    is_arr = lambda x: hasattr(x, "shape") and hasattr(x, "dtype")
    leaves, treedef = jax.tree_util.tree_flatten(tree, is_leaf=lambda x: isinstance(x, str))
    stats = []
    for leaf in leaves:
        if is_arr(leaf):
            a = np.asarray(leaf, np.float32)
            # std 0 stays 0: a constant leaf (norm gamma, zero bias) must
            # come back constant at its mean, not as N(mean, 1) noise
            stats.append((float(a.mean()), float(a.std())))
        else:
            stats.append(None)

    arr_idx = [i for i, s in enumerate(stats) if s is not None]

    def build(key):
        # arrays only — non-array leaves (layer-type tags) can't cross jit
        out = []
        for i in arr_idx:
            mean, std = stats[i]
            r = jr.normal(jr.fold_in(key, i), leaves[i].shape, jnp.float32) * std + mean
            out.append(r.astype(leaves[i].dtype))
        return out

    gen = jax.jit(build)(jr.PRNGKey(seed))
    new_leaves = list(leaves)
    for i, g in zip(arr_idx, gen):
        new_leaves[i] = g
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
