import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightx2v_tpu.schedulers.euler import FlowMatchEulerScheduler
from lightx2v_tpu.schedulers.step_distill import WanStepDistillScheduler
from lightx2v_tpu.schedulers.unipc import WanUniPCScheduler, reference_unipc_numpy
from lightx2v_tpu.utils.config import ConfigDict

SHAPE = (2, 3, 4, 4)


def run_scheduler(sched, state, flow_fn):
    """Drive the scheduler with flow predictions from flow_fn(latents, i)."""
    for i in range(sched.num_steps()):
        latents_bf16, t = sched.step_pre(state)
        flow = flow_fn(state["latents"], i)
        state = sched.step_post(state, flow)
    return state


class TestUniPC:
    def make(self, steps=10, shift=5.0):
        cfg = ConfigDict({"infer_steps": steps, "sample_shift": shift})
        return WanUniPCScheduler(cfg)

    def test_schedule_tables_match_reference_formula(self):
        sched = self.make(steps=10, shift=5.0)
        sched.prepare(SHAPE, seed=0)
        # reference: sigmas = shift*s/(1+(shift-1)*s) over linspace of the
        # 1000-point flow grid endpoints
        base = 1.0 - np.linspace(1, 1 / 1000, 1000)[::-1]
        smax, smin = base[0], base[-1]
        sig = np.linspace(smax, smin, 11)[:-1]
        sig = 5.0 * sig / (1 + 4.0 * sig)
        np.testing.assert_allclose(sched.sigmas[:-1], sig, rtol=1e-6)
        assert sched.sigmas[-1] == 0.0
        # model-input timesteps are integer-truncated (reference
        # set_timesteps casts to int64; verified directly in
        # test_reference_equivalence.py)
        np.testing.assert_allclose(sched.timesteps, np.trunc(sig * 1000), rtol=1e-6)

    def test_order_schedule(self):
        sched = self.make(steps=6)
        sched.prepare(SHAPE, seed=0)
        # step0 order1 (warmup), then order2, last step capped to 1
        assert list(sched.pred_order) == [1, 2, 2, 2, 2, 1]
        assert list(sched.corr_order) == [0, 1, 2, 2, 2, 2]

    def test_exact_flow_recovers_x0(self):
        """If the model returns the true flow (x_t - x0)/sigma_t, UniPC must
        land exactly on x0 (flow-matching linear-path identity)."""
        sched = self.make(steps=8, shift=3.0)
        state = sched.prepare(SHAPE, seed=0)
        x0 = jnp.asarray(np.random.default_rng(1).standard_normal(SHAPE), jnp.float32)

        def true_flow(latents, i):
            return (latents - x0) / sched.sigmas[i]

        state = run_scheduler(sched, state, true_flow)
        np.testing.assert_allclose(np.asarray(state["latents"]), np.asarray(x0), rtol=1e-4, atol=1e-4)

    def test_matches_numpy_oracle(self):
        """Random flow preds: jittable step must reproduce the float64
        reference implementation of UniPC-bh2."""
        steps = 7
        sched = self.make(steps=steps, shift=5.0)
        state = sched.prepare(SHAPE, seed=3)
        rng = np.random.default_rng(0)
        eps = rng.standard_normal((steps, *SHAPE)).astype(np.float32)

        jax_state = state
        step = jax.jit(sched.step_post)
        for i in range(steps):
            jax_state = step(jax_state, jnp.asarray(eps[i]))

        ref = reference_unipc_numpy(
            {"x0": np.asarray(state["latents"]), "eps": eps},
            np.asarray(sched.sigmas, np.float64),
        )
        np.testing.assert_allclose(np.asarray(jax_state["latents"]), ref, rtol=2e-4, atol=2e-4)

    def test_scan_compatible(self):
        """step_post must run inside lax.scan (static shapes, traced index)."""
        sched = self.make(steps=5)
        state = sched.prepare(SHAPE, seed=0)
        eps = jnp.zeros((5, *SHAPE), jnp.float32)

        def body(s, e):
            return sched.step_post(s, e), None

        out, _ = jax.lax.scan(body, state, eps)
        assert out["step_index"] == 5
        assert np.isfinite(np.asarray(out["latents"])).all()


class TestStepDistill:
    def test_timesteps_match_reference(self):
        cfg = ConfigDict(
            {"infer_steps": 4, "sample_shift": 5.0, "denoising_step_list": [1000, 750, 500, 250]}
        )
        sched = WanStepDistillScheduler(cfg)
        sched.prepare(SHAPE, seed=0)
        sig = np.linspace(1.0, 0.0, 1001)[:-1]
        sig = 5.0 * sig / (1 + 4.0 * sig)
        idx = [0, 250, 500, 750]
        np.testing.assert_allclose(sched.sigmas, sig[idx], rtol=1e-6)
        assert sched.sigmas[0] == 1.0

    def test_exact_flow_recovers_x0(self):
        cfg = ConfigDict(
            {"infer_steps": 4, "sample_shift": 5.0, "denoising_step_list": [1000, 750, 500, 250]}
        )
        sched = WanStepDistillScheduler(cfg)
        state = sched.prepare(SHAPE, seed=0)
        x0 = jnp.asarray(np.random.default_rng(2).standard_normal(SHAPE), jnp.float32)

        def true_flow(latents, i):
            return (latents - x0) / sched.sigmas[i]

        state = run_scheduler(sched, state, true_flow)
        # re-noising at intermediate steps keeps the trajectory on the path;
        # final step has sigma_next=0 so latents == x0 exactly
        np.testing.assert_allclose(np.asarray(state["latents"]), np.asarray(x0), rtol=1e-4, atol=1e-4)


class TestEuler:
    def test_exact_flow_recovers_x0(self):
        cfg = ConfigDict({"infer_steps": 12, "sample_shift": 7.0})
        sched = FlowMatchEulerScheduler(cfg)
        state = sched.prepare(SHAPE, seed=0)
        x0 = jnp.asarray(np.random.default_rng(3).standard_normal(SHAPE), jnp.float32)

        def true_flow(latents, i):
            # d x / d sigma = noise - x0 = (x - x0)/sigma on the linear path
            return (latents - x0) / sched.sigmas[i]

        state = run_scheduler(sched, state, true_flow)
        np.testing.assert_allclose(np.asarray(state["latents"]), np.asarray(x0), rtol=1e-4, atol=1e-4)

    def test_sigma_table(self):
        cfg = ConfigDict({"infer_steps": 10, "sample_shift": 7.0})
        sched = FlowMatchEulerScheduler(cfg)
        sched.prepare(SHAPE, seed=0)
        assert sched.sigmas[0] == pytest.approx(1.0)
        assert sched.sigmas[-1] == pytest.approx(0.0)
        assert len(sched.timesteps) == 10
