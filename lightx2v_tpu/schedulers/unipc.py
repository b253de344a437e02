"""UniPC multistep scheduler for Wan flow matching.

Math follows the reference (lightx2v/models/schedulers/wan/scheduler.py:
predictor ``multistep_uni_p_bh_update`` :130-219, corrector
``multistep_uni_c_bh_update`` :221-320, solver order 2, bh2 variant
B(h)=expm1(-h)), re-derived in closed form for orders {1, 2} so the whole
update is branch-free scalar math + elementwise latent ops — a clean
``lax.scan`` body with no data-dependent Python control flow.

Flow-matching parameterization: alpha_t = 1 - sigma_t, x0-prediction
conversion ``x0 = sample - sigma * flow_pred``.

Order bookkeeping (reference step_post :322-360): at step i the corrector
runs with the order chosen at step i-1; the predictor order is
min(2, n_steps - i, lower_order_nums + 1). Both sequences depend only on
the step index, so they are precomputed host-side and fed to the traced
step as per-step scalars.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.registry import SCHEDULER_REGISTER
from .base import SchedulerBase, State


def flow_sigmas(num_train_timesteps: int = 1000, shift: float = 1.0) -> np.ndarray:
    """Training sigma grid with shift warp (reference :35-42)."""
    alphas = np.linspace(1, 1 / num_train_timesteps, num_train_timesteps)[::-1].copy()
    sigmas = 1.0 - alphas
    return shift * sigmas / (1 + (shift - 1) * sigmas)


@SCHEDULER_REGISTER.register(["unipc", "wan"])
class WanUniPCScheduler(SchedulerBase):
    solver_order = 2
    num_train_timesteps = 1000

    def __init__(self, config):
        super().__init__(config)
        self.sample_shift = float(config.sample_shift)
        # the reference hardcodes solver_order=2 (wan/scheduler.py:18) but
        # its predictor/corrector implement general order (:130-320);
        # orders 1-3 are supported here (3 uses the masked-solve path)
        self.solver_order = int(config.get("solver_order", 2))
        if not 1 <= self.solver_order <= 3:
            raise ValueError(f"solver_order {self.solver_order} unsupported (1-3)")

    def prepare(self, target_shape, seed: int, shift: Optional[float] = None,
                start_step: int = 0) -> State:
        base = flow_sigmas(self.num_train_timesteps, shift=1.0)
        sigma_max, sigma_min = float(base[0]), float(base[-1])
        # inference grid (reference set_timesteps :65-94)
        sig = np.linspace(sigma_max, sigma_min, self.infer_steps + 1).copy()[:-1]
        sh = self.sample_shift if shift is None else shift
        sig = sh * sig / (1 + (sh - 1) * sig)
        # model-input timesteps are TRUNCATED to integers (reference
        # set_timesteps casts to int64, :86) — the sigma table keeps full
        # precision; only the conditioning embedding sees the int value
        self.timesteps = np.trunc(sig * self.num_train_timesteps).astype(np.float32)
        self.sigmas = np.concatenate([sig, [0.0]]).astype(np.float32)

        n = self.infer_steps
        # host-side order schedules; ``start_step`` restarts the multistep
        # warm-up mid-schedule (changing-resolution phase B resets history,
        # reference set_timesteps :88-93)
        pred_order = np.zeros(n, np.int32)
        corr_order = np.zeros(n, np.int32)  # order used by corrector at step i
        lower = 0
        prev_this_order = 0
        for i in range(start_step, n):
            corr_order[i] = prev_this_order if i > start_step else 0  # 0 = no corrector
            this_order = min(self.solver_order, n - i, lower + 1)
            pred_order[i] = this_order
            prev_this_order = this_order
            if lower < self.solver_order:
                lower += 1
        self.pred_order = pred_order
        self.corr_order = corr_order

        latents = self.init_latents(target_shape, seed)
        zeros = jnp.zeros_like(latents)
        return {
            "latents": latents,
            "step_index": jnp.asarray(0, jnp.int32),
            # ring buffer of the last `solver_order` converted (x0) outputs;
            # model_outputs[-1] == m0
            "m_prev": zeros,  # model_outputs[-1]
            "m_prev2": zeros,  # model_outputs[-2]
            "m_prev3": zeros,  # model_outputs[-3] (order 3 only)
            "last_sample": zeros,
        }

    # -- closed-form bh2 updates ------------------------------------------
    @staticmethod
    def _lam(sigma):
        alpha = 1.0 - sigma
        return jnp.log(alpha) - jnp.log(sigma)

    def step_post(self, state: State, noise_pred: jnp.ndarray) -> State:
        if self.solver_order >= 3:
            return self._step_post_general(state, noise_pred)
        i = state["step_index"]
        sigmas = jnp.asarray(self.sigmas, jnp.float32)
        pred_order = jnp.asarray(self.pred_order)[i]
        corr_order = jnp.asarray(self.corr_order)[i]

        sample = state["latents"].astype(jnp.float32)
        flow = noise_pred.astype(jnp.float32)
        sigma_i = sigmas[i]
        m_convert = sample - sigma_i * flow  # x0 prediction (reference :99-117)

        # ---- corrector (uses sigma[i-1] -> sigma[i]) ----
        def corrected():
            sigma_t, sigma_s0 = sigmas[i], sigmas[jnp.maximum(i - 1, 0)]
            lam_t, lam_s0 = self._lam(sigma_t), self._lam(sigma_s0)
            h = lam_t - lam_s0
            hh = -h
            h_phi_1 = jnp.expm1(hh)
            B_h = h_phi_1
            b0 = (h_phi_1 / hh - 1.0) / B_h  # b[0] = h_phi_k * 1 / B_h
            h_phi_k2 = (h_phi_1 / hh - 1.0) / hh - 0.5
            b1 = h_phi_k2 * 2.0 / B_h
            # order 2 needs r0 = (lam_{i-2} - lam_s0)/h
            sigma_s1 = sigmas[jnp.maximum(i - 2, 0)]
            lam_s1 = self._lam(sigma_s1)
            r0 = (lam_s1 - lam_s0) / h
            # solve [[1,1],[r0,1]] rhos = [b0,b1]
            rho0_o2 = (b1 - b0) / (r0 - 1.0)
            rho1_o2 = b0 - rho0_o2
            is2 = (corr_order == 2).astype(jnp.float32)
            rho0 = is2 * rho0_o2  # D1s coefficient (0 for order 1)
            rho1 = jnp.where(corr_order == 2, rho1_o2, 0.5)  # D1_t coefficient
            m0 = state["m_prev"]
            m1 = state["m_prev2"]
            d1s = jnp.where(corr_order == 2, (m1 - m0) / jnp.where(r0 == 0, 1.0, r0), 0.0)
            d1t = m_convert - m0
            x = state["last_sample"]
            alpha_t = 1.0 - sigma_t
            x_t = sigma_t / sigma_s0 * x - alpha_t * h_phi_1 * m0
            return x_t - alpha_t * B_h * (rho0 * d1s + rho1 * d1t)

        sample = jnp.where(corr_order > 0, corrected(), sample)

        # ---- predictor (sigma[i] -> sigma[i+1]) ----
        sigma_t, sigma_s0 = sigmas[i + 1], sigmas[i]
        alpha_t = 1.0 - sigma_t
        lam_s0 = self._lam(sigma_s0)
        # sigma_{n} == 0 -> lam = +inf; expm1(-inf) = -1; handle via where
        lam_t = jnp.where(sigma_t > 0, self._lam(jnp.maximum(sigma_t, 1e-20)), jnp.inf)
        h = lam_t - lam_s0
        hh = -h
        h_phi_1 = jnp.expm1(hh)
        B_h = h_phi_1
        m0 = m_convert
        # order 2 extra term
        sigma_s1 = sigmas[jnp.maximum(i - 1, 0)]
        lam_s1 = self._lam(sigma_s1)
        r0 = (lam_s1 - lam_s0) / jnp.where(h == 0, 1.0, h)
        m1 = state["m_prev"]
        d1s = jnp.where(pred_order == 2, (m1 - m0) / jnp.where(r0 == 0, 1.0, r0), 0.0)
        rho_p = 0.5 * (pred_order == 2).astype(jnp.float32)
        ratio = jnp.where(sigma_s0 > 0, sigma_t / sigma_s0, 0.0)
        x_t = ratio * sample - alpha_t * h_phi_1 * m0
        x_t = x_t - alpha_t * B_h * rho_p * d1s

        return {
            "latents": x_t,
            "step_index": i + 1,
            "m_prev": m_convert,
            "m_prev2": state["m_prev"],
            "m_prev3": state["m_prev2"],
            "last_sample": sample,
        }

    # -- general-order (<=3) masked-solve path ------------------------------
    def _step_post_general(self, state: State, noise_pred: jnp.ndarray) -> State:
        """UniPC bh2 with per-step order in {1,2,3}, the reference's general
        R@rhos=b solve (wan/scheduler.py:184-211, 281-301) expressed as a
        fixed-size (3x3) masked linear system so it stays jittable with a
        traced order scalar."""
        i = state["step_index"]
        sigmas = jnp.asarray(self.sigmas, jnp.float32)
        pred_order = jnp.asarray(self.pred_order)[i]
        corr_order = jnp.asarray(self.corr_order)[i]

        sample = state["latents"].astype(jnp.float32)
        flow = noise_pred.astype(jnp.float32)
        m_convert = sample - sigmas[i] * flow

        def _bvec(h):
            """b_k = h_phi_k * k! / B_h for k=1..3 (reference :194-201)."""
            hh = -h
            h_phi_1 = jnp.expm1(hh)
            B_h = h_phi_1
            h_phi_k = h_phi_1 / hh - 1.0
            b1 = h_phi_k / B_h
            h_phi_k = h_phi_k / hh - 0.5
            b2 = h_phi_k * 2.0 / B_h
            h_phi_k = h_phi_k / hh - 1.0 / 6.0
            b3 = h_phi_k * 6.0 / B_h
            return h_phi_1, B_h, jnp.stack([b1, b2, b3])

        def _masked_solve(rks, b, size):
            """Solve the leading (size x size) Vandermonde system
            R[j,k]=rks[k]^j, padded to 3x3 with identity rows so the
            trailing rhos are exactly 0."""
            jj = jnp.arange(3)
            active = (jj[:, None] < size) & (jj[None, :] < size)
            powers = rks[None, :] ** jj[:, None]
            eye = jnp.eye(3, dtype=jnp.float32)
            A = jnp.where(active, powers, eye)
            rhs = jnp.where(jj < size, b, 0.0)
            return jnp.linalg.solve(A, rhs)

        def _pick(vec, idx):
            return jnp.where(idx == 0, vec[0], jnp.where(idx == 1, vec[1], vec[2]))

        # ---- corrector (sigma[i-1] -> sigma[i]); order o = corr_order ----
        def corrected():
            o = corr_order
            sigma_t, sigma_s0 = sigmas[i], sigmas[jnp.maximum(i - 1, 0)]
            lam_t, lam_s0 = self._lam(sigma_t), self._lam(sigma_s0)
            h = lam_t - lam_s0
            h_phi_1, B_h, b = _bvec(h)
            # histories: m0 = m_prev (model_outputs[-1]); mk = {m_prev2, m_prev3}
            m0 = state["m_prev"]
            lam_k = self._lam(sigmas[jnp.maximum(i - 1 - jnp.arange(1, 3), 0)])
            rk = (lam_k - lam_s0) / h  # (2,)
            rk_safe = jnp.where(rk == 0, 1.0, rk)
            d1_1 = (state["m_prev2"] - m0) / rk_safe[0]
            d1_2 = (state["m_prev3"] - m0) / rk_safe[1]
            # rks vector layout for order o: [r1..r_{o-1}, 1, pad...]; build
            # per-order explicitly (o is traced but in {1,2,3})
            rks_o2 = jnp.stack([rk[0], 1.0, 1.0])
            rks_o3 = jnp.stack([rk[0], rk[1], 1.0])
            rks = jnp.where(o >= 3, rks_o3, rks_o2)
            rhos = _masked_solve(rks, b, o)
            rhos = jnp.where(o == 1, jnp.asarray([0.5, 0.0, 0.0]), rhos)  # reference :308
            d1t_coef = _pick(rhos, jnp.maximum(o - 1, 0))
            c1 = jnp.where(o >= 2, rhos[0], 0.0)
            c2 = jnp.where(o >= 3, rhos[1], 0.0)
            d1_t = m_convert - m0
            x = state["last_sample"]
            alpha_t = 1.0 - sigma_t
            x_t = sigma_t / sigma_s0 * x - alpha_t * h_phi_1 * m0
            return x_t - alpha_t * B_h * (c1 * d1_1 + c2 * d1_2 + d1t_coef * d1_t)

        sample = jnp.where(corr_order > 0, corrected(), sample)

        # ---- predictor (sigma[i] -> sigma[i+1]); order o = pred_order ----
        o = pred_order
        sigma_t, sigma_s0 = sigmas[i + 1], sigmas[i]
        alpha_t = 1.0 - sigma_t
        lam_s0 = self._lam(sigma_s0)
        lam_t = jnp.where(sigma_t > 0, self._lam(jnp.maximum(sigma_t, 1e-20)), jnp.inf)
        h = lam_t - lam_s0
        h_phi_1, B_h, b = _bvec(h)
        m0 = m_convert
        lam_k = self._lam(sigmas[jnp.maximum(i - jnp.arange(1, 3), 0)])
        rk = (lam_k - lam_s0) / jnp.where(h == 0, 1.0, h)
        rk_safe = jnp.where(rk == 0, 1.0, rk)
        d1_1 = (state["m_prev"] - m0) / rk_safe[0]
        d1_2 = (state["m_prev2"] - m0) / rk_safe[1]
        # predictor solves the leading (o-1)-sized system (reference :205-210)
        rks_p = jnp.stack([rk[0], rk[1], 1.0])
        rhos_p = _masked_solve(rks_p, b, jnp.maximum(o - 1, 0))
        rhos_p = jnp.where(o == 2, jnp.asarray([0.5, 0.0, 0.0]), rhos_p)  # reference :207
        p1 = jnp.where(o >= 2, rhos_p[0], 0.0)
        p2 = jnp.where(o >= 3, rhos_p[1], 0.0)
        ratio = jnp.where(sigma_s0 > 0, sigma_t / sigma_s0, 0.0)
        x_t = ratio * sample - alpha_t * h_phi_1 * m0
        x_t = x_t - alpha_t * B_h * (p1 * d1_1 + p2 * d1_2)

        return {
            "latents": x_t,
            "step_index": i + 1,
            "m_prev": m_convert,
            "m_prev2": state["m_prev"],
            "m_prev3": state["m_prev2"],
            "last_sample": sample,
        }


def reference_unipc_numpy(flow_preds, sigmas, solver_order=2) -> np.ndarray:
    """Independent float64 numpy implementation of the same math, used as
    the golden oracle in tests (runs the full step sequence given the
    per-step flow predictions)."""
    n = len(sigmas) - 1
    lam = lambda s: math.log(1 - s) - math.log(s) if s > 0 else float("inf")
    latents = None
    model_outputs = [None] * solver_order
    last_sample = None
    lower = 0
    this_order_prev = None
    x = flow_preds["x0"].astype(np.float64)
    latents = x.copy()
    for i in range(n):
        flow = flow_preds["eps"][i].astype(np.float64)
        sample = latents.copy()
        m_convert = sample - sigmas[i] * flow
        use_corr = i > 0 and last_sample is not None
        if use_corr:
            order = this_order_prev
            sigma_t, sigma_s0 = sigmas[i], sigmas[i - 1]
            alpha_t = 1 - sigma_t
            h = lam(sigma_t) - lam(sigma_s0)
            hh = -h
            h_phi_1 = math.expm1(hh)
            B_h = h_phi_1
            b0 = (h_phi_1 / hh - 1.0) / B_h
            h_phi_k2 = (h_phi_1 / hh - 1.0) / hh - 0.5
            b1 = h_phi_k2 * 2.0 / B_h
            m0 = model_outputs[-1]
            d1t = m_convert - m0
            if order == 2:
                r0 = (lam(sigmas[i - 2]) - lam(sigma_s0)) / h
                rho0 = (b1 - b0) / (r0 - 1.0)
                rho1 = b0 - rho0
                d1s = (model_outputs[-2] - m0) / r0
                corr = rho0 * d1s + rho1 * d1t
            else:
                corr = 0.5 * d1t
            sample = sigma_t / sigma_s0 * last_sample - alpha_t * h_phi_1 * m0 - alpha_t * B_h * corr
        model_outputs = model_outputs[1:] + [m_convert]
        this_order = min(solver_order, n - i, lower + 1)
        this_order_prev = this_order
        last_sample = sample
        # predictor
        sigma_t, sigma_s0 = sigmas[i + 1], sigmas[i]
        alpha_t = 1 - sigma_t
        if sigma_t > 0:
            h = lam(sigma_t) - lam(sigma_s0)
            hh = -h
            h_phi_1 = math.expm1(hh)
        else:
            h_phi_1 = -1.0
            h = float("inf")
        B_h = h_phi_1
        m0 = m_convert
        pred = (sigma_t / sigma_s0) * sample - alpha_t * h_phi_1 * m0
        if this_order == 2:
            r0 = (lam(sigmas[i - 1]) - lam(sigma_s0)) / h
            d1s = (model_outputs[-2] - m0) / r0
            pred = pred - alpha_t * B_h * 0.5 * d1s
        latents = pred
        if lower < solver_order:
            lower += 1
    return latents
