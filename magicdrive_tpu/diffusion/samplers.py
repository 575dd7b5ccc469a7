"""Samplers as precomputed per-step coefficient tables + a branchless step.

TPU-native design: for a fixed number of inference steps, every scalar in the
UniPC multistep update (ref:third_party/diffusers .../scheduling_unipc_multistep.py,
used by the reference at ref:magicdrive/misc/test_utils.py:129) is a function
of the static timestep grid only. We therefore fold the whole
predictor/corrector algebra — order warmup, lower-order-final, bh2 B(h)
coefficients, the 2x2 rho solve — into numpy-precomputed (K,) arrays, and the
on-device step is five fused multiply-adds inside one ``lax.scan``/``fori_loop``.
No data-dependent control flow ever reaches XLA.

Supported: solver_order in {1, 2} (2 = shipped default), predict_x0=True,
bh2, lower_order_final=True, epsilon-prediction models.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from .schedules import NoiseSchedule


@dataclasses.dataclass(frozen=True)
class DDIMCoeffs:
    """x_{i+1} = a[i] * x + b[i] * eps  (eta=0 DDIM)."""

    timesteps: np.ndarray  # (K,) int
    a: np.ndarray
    b: np.ndarray

    def init_state(self, shape, dtype=jnp.float32):
        return {}

    def step(self, i, x, eps, state):
        a = jnp.asarray(self.a)[i]
        b = jnp.asarray(self.b)[i]
        return a * x + b * eps.astype(x.dtype), state

    @property
    def num_steps(self):
        return len(self.timesteps)


@dataclasses.dataclass(frozen=True)
class UniPCCoeffs:
    """Branchless UniPC-2 (B(h)=bh2) with precomputed scalars.

    Per step i with epsilon model output ``eps`` on sample ``x``:
      m     = cv_a[i]*x - cv_b[i]*eps                       (x0 prediction)
      x_c   = c_a[i]*x_last - c_b[i]*m1
              - c_d[i]*(m2 - m1) - c_e[i]*(m - m1)          (UniC corrector)
      x     = use_c[i]*x_c + (1-use_c[i])*x
      x'    = p_a[i]*x - p_b[i]*m - p_c[i]*(m1 - m)         (UniP predictor)
      state = (x_last=x, m1=m, m2=m1)
    """

    timesteps: np.ndarray
    cv_a: np.ndarray
    cv_b: np.ndarray
    use_c: np.ndarray
    c_a: np.ndarray
    c_b: np.ndarray
    c_d: np.ndarray
    c_e: np.ndarray
    p_a: np.ndarray
    p_b: np.ndarray
    p_c: np.ndarray

    @property
    def num_steps(self):
        return len(self.timesteps)

    def init_state(self, shape, dtype=jnp.float32):
        z = jnp.zeros(shape, dtype)
        return {"x_last": z, "m1": z, "m2": z}

    def step(self, i, x, eps, state):
        g = lambda arr: jnp.asarray(arr, x.dtype)[i]
        m = g(self.cv_a) * x - g(self.cv_b) * eps.astype(x.dtype)
        m1, m2 = state["m1"], state["m2"]
        x_c = (g(self.c_a) * state["x_last"] - g(self.c_b) * m1
               - g(self.c_d) * (m2 - m1) - g(self.c_e) * (m - m1))
        uc = g(self.use_c)
        x = uc * x_c + (1.0 - uc) * x
        x_next = g(self.p_a) * x - g(self.p_b) * m - g(self.p_c) * (m1 - m)
        return x_next, {"x_last": x, "m1": m, "m2": m1}


def _bh2_b_coeffs(hh: float) -> Tuple[float, float, float, float]:
    """phi coefficients for bh2: returns (phi1, B_h, b1, b2)."""
    phi1 = np.expm1(hh)
    B_h = np.expm1(hh)
    h_phi_k = phi1 / hh - 1.0
    b1 = h_phi_k * 1.0 / B_h
    h_phi_k = h_phi_k / hh - 1.0 / 2.0
    b2 = h_phi_k * 2.0 / B_h
    return phi1, B_h, b1, b2


def make_unipc_coeffs(
    schedule: NoiseSchedule,
    num_inference_steps: int,
    solver_order: int = 2,
    lower_order_final: bool = True,
) -> UniPCCoeffs:
    assert solver_order in (1, 2), "orders 1/2 supported (2 = shipped default)"
    ts = schedule.inference_timesteps(num_inference_steps)
    K = len(ts)
    lam = schedule.lambda_t
    alpha = schedule.alpha_t
    sigma = schedule.sigma_t

    z = np.zeros(K)
    out = {k: z.copy() for k in
           ("cv_a", "cv_b", "use_c", "c_a", "c_b", "c_d", "c_e",
            "p_a", "p_b", "p_c")}

    for i in range(K):
        t = int(ts[i])
        prev_t = int(ts[i + 1]) if i < K - 1 else 0
        out["cv_a"][i] = 1.0 / alpha[t]
        out["cv_b"][i] = sigma[t] / alpha[t]

        # ---- predictor (UniP) at step i: t -> prev_t ----
        if lower_order_final:
            order_p = min(solver_order, K - i, i + 1)
        else:
            order_p = min(solver_order, i + 1)
        h = lam[prev_t] - lam[t]
        hh = -h
        phi1, B_h, _, _ = _bh2_b_coeffs(hh)
        out["p_a"][i] = sigma[prev_t] / sigma[t]
        out["p_b"][i] = alpha[prev_t] * phi1
        if order_p >= 2:
            s_prev = int(ts[i - 1])
            rk0 = (lam[s_prev] - lam[t]) / h
            out["p_c"][i] = alpha[prev_t] * B_h * 0.5 / rk0

        # ---- corrector (UniC) at step i: corrects x at t using history ----
        if i > 0:
            s0 = int(ts[i - 1])
            if lower_order_final:
                order_c = min(solver_order, K - (i - 1), i)
            else:
                order_c = min(solver_order, i)
            hc = lam[t] - lam[s0]
            hhc = -hc
            phi1c, B_hc, b1, b2 = _bh2_b_coeffs(hhc)
            out["use_c"][i] = 1.0
            out["c_a"][i] = sigma[t] / sigma[s0]
            out["c_b"][i] = alpha[t] * phi1c
            if order_c == 1:
                out["c_e"][i] = alpha[t] * B_hc * 0.5
            else:
                s1 = int(ts[i - 2])
                rk0 = (lam[s1] - lam[s0]) / hc
                # solve [[1, 1], [rk0, 1]] @ rhos = [b1, b2]
                rhos = np.linalg.solve(np.array([[1.0, 1.0], [rk0, 1.0]]),
                                       np.array([b1, b2]))
                out["c_d"][i] = alpha[t] * B_hc * rhos[0] / rk0
                out["c_e"][i] = alpha[t] * B_hc * rhos[1]

    return UniPCCoeffs(timesteps=ts, **out)


def make_ddim_coeffs(schedule: NoiseSchedule,
                     num_inference_steps: int,
                     timesteps: np.ndarray = None) -> DDIMCoeffs:
    """``timesteps`` overrides the grid (descending ints) — e.g. diffusers'
    "leading" spacing instead of the default linspace spacing."""
    ts = np.asarray(timesteps) if timesteps is not None else \
        schedule.inference_timesteps(num_inference_steps)
    K = len(ts)
    alpha, sigma = schedule.alpha_t, schedule.sigma_t
    a = np.zeros(K)
    b = np.zeros(K)
    for i in range(K):
        t = int(ts[i])
        prev_t = int(ts[i + 1]) if i < K - 1 else -1
        a_prev = alpha[prev_t] if prev_t >= 0 else 1.0
        s_prev = sigma[prev_t] if prev_t >= 0 else 0.0
        a[i] = a_prev / alpha[t]
        b[i] = s_prev - a_prev * sigma[t] / alpha[t]
    return DDIMCoeffs(timesteps=ts, a=a, b=b)


def make_sampler_coeffs(schedule: NoiseSchedule, num_inference_steps: int,
                        sampler: str = "unipc"):
    if sampler == "unipc":
        return make_unipc_coeffs(schedule, num_inference_steps)
    if sampler == "ddim":
        return make_ddim_coeffs(schedule, num_inference_steps)
    raise ValueError(sampler)
