"""Radial block-sparse attention + ring attention tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from lightx2v_tpu.ops.attention import attn_xla
from lightx2v_tpu.ops.pallas.block_sparse_attention import block_sparse_attention
from lightx2v_tpu.ops.radial import MaskMap, mask_to_indices, radial_block_mask
from lightx2v_tpu.parallel.mesh import build_mesh
from lightx2v_tpu.parallel.ring import _partial_attn_jnp, merge_partials, ring_attention


def rand(*shape, key=0):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32) * 0.5


class TestRadialMask:
    def test_structure(self):
        # 8 frames x 1024 tokens video + 256 text tokens
        m = radial_block_mask(seq_len=8448, video_token_num=8192, num_frame=8)
        assert m.shape == (66, 66)
        assert m.diagonal().all()           # self blocks
        assert m[64:, :].all() and m[:, 64:].all()  # text rows/cols dense
        assert m[:, :8].all()               # frame-0 attention sink
        # distant frame pairs are sparse
        assert not m.all()
        assert m.mean() < 0.85

    def test_indices_roundtrip(self):
        m = radial_block_mask(640, 512, 4)
        idx, cnt = mask_to_indices(m)
        for i in range(m.shape[0]):
            assert set(idx[i, : cnt[i]].tolist()) == set(np.nonzero(m[i])[0].tolist())


class TestBlockSparseKernel:
    def test_dense_mask_matches_full_attention(self):
        b, s, n, d = 1, 256, 2, 128
        q, k, v = rand(b, s, n, d, key=1), rand(b, s, n, d, key=2), rand(b, s, n, d, key=3)
        q, k, v = [t.astype(jnp.bfloat16) for t in (q, k, v)]
        mask = np.ones((2, 2), bool)
        idx, cnt = mask_to_indices(mask)
        out = block_sparse_attention(q, k, v, jnp.asarray(idx), jnp.asarray(cnt), interpret=True)
        ref = attn_xla(q, k, v)
        np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                                   rtol=0.05, atol=0.02)

    def test_sparse_mask_matches_masked_attention(self):
        b, s, n, d = 1, 384, 1, 128
        q, k, v = [rand(b, s, n, d, key=i).astype(jnp.bfloat16) for i in (4, 5, 6)]
        mask = np.eye(3, dtype=bool)
        mask[0, 2] = True
        idx, cnt = mask_to_indices(mask)
        out = block_sparse_attention(q, k, v, jnp.asarray(idx), jnp.asarray(cnt), interpret=True)
        # reference: dense attention with token-level mask
        tok = np.repeat(np.repeat(mask, 128, 0), 128, 1)
        logits = np.einsum("bqnd,bknd->bnqk", np.asarray(q, np.float32), np.asarray(k, np.float32)) / np.sqrt(d)
        logits = np.where(tok[None, None], logits, -np.inf)
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
        ref = np.einsum("bnqk,bknd->bqnd", p, np.asarray(v, np.float32))
        np.testing.assert_allclose(np.asarray(out, np.float32), ref, rtol=0.05, atol=0.02)


class TestRing:
    def test_merge_partials_identity(self):
        """Splitting keys into two halves and merging partials == full attn."""
        b, s, n, d = 1, 32, 2, 16
        q, k, v = rand(b, s, n, d, key=7), rand(b, s, n, d, key=8), rand(b, s, n, d, key=9)
        o1, l1 = _partial_attn_jnp(q, k[:, :16], v[:, :16])
        o2, l2 = _partial_attn_jnp(q, k[:, 16:], v[:, 16:])
        out, _ = merge_partials(o1, l1, o2, l2)
        ref = attn_xla(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
    def test_ring_attention_matches_dense(self):
        mesh = build_mesh({"sp": 4, "dp": 2})
        b, s, n, d = 2, 64, 2, 16
        q, k, v = [rand(b, s, n, d, key=i) for i in (10, 11, 12)]
        ref = attn_xla(q, k, v)

        def f(ql, kl, vl):
            return ring_attention(ql, kl, vl, axis="sp")

        out = jax.shard_map(f, mesh=mesh, in_specs=P("dp", "sp"), out_specs=P("dp", "sp"),
                            check_vma=False)(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=1e-3)

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
    def test_ring_attention_with_text_tail(self):
        mesh = build_mesh({"sp": 4, "dp": 2})
        b, s, n, d = 2, 32, 2, 16
        q, k, v = [rand(b, s, n, d, key=i) for i in (13, 14, 15)]
        tk, tv = rand(b, 8, n, d, key=16), rand(b, 8, n, d, key=17)
        ref = attn_xla(q, jnp.concatenate([k, tk], 1), jnp.concatenate([v, tv], 1))

        def f(ql, kl, vl, tkl, tvl):
            return ring_attention(ql, kl, vl, axis="sp", txt_k=tkl, txt_v=tvl)

        out = jax.shard_map(f, mesh=mesh,
                            in_specs=(P("dp", "sp"), P("dp", "sp"), P("dp", "sp"), P("dp"), P("dp")),
                            out_specs=P("dp", "sp"), check_vma=False)(q, k, v, tk, tv)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=1e-3)


class TestSuperblockRadial:
    def test_coarsen_is_superset(self):
        from lightx2v_tpu.ops.radial import coarsen_block_mask
        m = radial_block_mask(seq_len=8448, video_token_num=8192, num_frame=8)
        c = coarsen_block_mask(m, 8, 4)
        for bi in range(m.shape[0]):
            for bj in range(m.shape[1]):
                if m[bi, bj]:
                    assert c[bi // 8, bj // 4]

    def test_superblock_kernel_matches_fine(self):
        """Radial at superblock granularity == dense masked attention with
        the coarsened mask (interpret mode)."""
        import jax.numpy as jnp
        from lightx2v_tpu.ops.radial import coarsen_block_mask
        rng = np.random.default_rng(3)
        s, n, d = 1024, 2, 64
        q, k, v = (jnp.asarray(rng.standard_normal((1, s, n, d)), jnp.float32) * 0.5
                   for _ in range(3))
        m = radial_block_mask(seq_len=s, video_token_num=896, num_frame=4)
        c = coarsen_block_mask(m, 4, 2)
        idx, cnt = mask_to_indices(c)
        out = block_sparse_attention(q, k, v, jnp.asarray(idx), jnp.asarray(cnt),
                                     bq=512, bk=256, interpret=True)
        # dense oracle with the coarsened token mask
        tok = np.repeat(np.repeat(c, 512, 0), 256, 1)[:s, :s]
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k) / np.sqrt(d)
        logits = jnp.where(jnp.asarray(tok)[None, None], logits, -jnp.inf)
        ref = jnp.einsum("bnqk,bknd->bqnd", jax.nn.softmax(logits, -1).astype(v.dtype), v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


class TestRadialTwoPass:
    """Two-pass near/far decomposition (ops/radial.py radial_two_pass)."""

    F, TPF, TEXT = 12, 1024, 64

    def _cfg(self):
        video = self.F * self.TPF
        return video, video + self.TEXT

    def _reference_token_mask(self, decay=0.5):
        """Token-level reference semantics (radial_attn.py
        gen_log_mask_shrinked): per pair a band of width w(dist) AND the
        all-or-nothing diagonal-split rule; frame-0 sink; dense text."""
        from lightx2v_tpu.ops.radial import _diag_split_keep, _window_width

        video, s = self._cfg()
        m = np.zeros((s, s), bool)
        m[video:, :] = True
        m[:, video:] = True
        oi = np.arange(self.TPF)
        band = np.abs(oi[:, None] - oi[None, :])
        for i in range(self.F):
            for j in range(self.F):
                ri = slice(i * self.TPF, (i + 1) * self.TPF)
                rj = slice(j * self.TPF, (j + 1) * self.TPF)
                if j == 0:
                    m[ri, rj] = True
                    continue
                dist = abs(i - j)
                if not _diag_split_keep(dist, self.TPF):
                    continue
                w = _window_width(dist, self.TPF, decay, "wan")
                m[ri, rj] = band <= w
        return m

    def test_plan_mask_superset_of_reference(self):
        from lightx2v_tpu.ops.radial import two_pass_token_mask

        video, s = self._cfg()
        plan_mask = two_pass_token_mask(s, video, self.F, 0.5, "wan", block_q=64)
        ref_mask = self._reference_token_mask()
        missing = ref_mask & ~plan_mask
        assert not missing.any(), f"{missing.sum()} reference-mask cells uncovered"
        # toy tpf=256 keeps the 128-token window floors dominant; the
        # real sparsity payoff shows at production shapes (next test)
        assert plan_mask.mean() < 0.85

    def test_plan_work_ratio_at_720p(self):
        """At the 720P shape the decomposition's total q*k work must be
        well under half of dense (measured 0.356) — the whole point vs
        the coarsened-BSR path whose union density was ~0.95 dense."""
        from lightx2v_tpu.ops.radial import _two_pass_plan

        F, tpf, text = 21, 3600, 512
        video = F * tpf
        plan = _two_pass_plan(video + text, video, F, 0.5, "wan", 256)
        tpf_, bq, near, fars = plan
        work = F * tpf * near.shape[1]
        for fi in range(F):
            if fars[fi] is not None:
                nt, kf = fars[fi].shape
                work += nt * bq * kf
        assert work / (video + text) ** 2 < 0.5

    def test_two_pass_matches_masked_oracle(self):
        """radial_two_pass == dense softmax under the plan's own token
        mask (exact; the LSE merge and gathers must be lossless)."""
        from lightx2v_tpu.ops.radial import MaskMap, radial_two_pass, two_pass_token_mask

        video, s = self._cfg()
        rng = np.random.default_rng(0)
        b, n, d = 1, 2, 32
        q = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32) * 0.3
        k = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32) * 0.3
        v = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32)
        mm = MaskMap(video_token_num=video, num_frame=self.F)
        out = radial_two_pass(q, k, v, mm, block_q=64)
        assert out is not None

        tok = two_pass_token_mask(s, video, self.F, 0.5, "wan", block_q=64)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32) / np.sqrt(d)
        logits = jnp.where(jnp.asarray(tok)[None, None], logits, -jnp.inf)
        ref = jnp.einsum("bnqk,bknd->bqnd", jax.nn.softmax(logits, -1), v)
        np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                                   rtol=2e-3, atol=2e-3)

    def test_small_shapes_decline(self):
        from lightx2v_tpu.ops.radial import MaskMap, radial_two_pass

        q = jnp.zeros((1, 64, 2, 16), jnp.float32)
        assert radial_two_pass(q, q, q, MaskMap(48, 3)) is None
