"""UniPC/DDIM sampler verification.

The branchless precomputed-coefficient sampler is checked against an
independent, stateful numpy implementation of the UniPC multistep algorithm
(general matrix-solve form, following the published UniPC update equations
https://arxiv.org/abs/2302.04867 with bh2 B(h), predict_x0, order warmup and
lower-order-final — the same semantics the reference gets from diffusers'
UniPCMultistepScheduler)."""
import numpy as np
import jax.numpy as jnp
import pytest

from magicdrive_tpu.diffusion.schedules import NoiseSchedule
from magicdrive_tpu.diffusion.samplers import (
    make_unipc_coeffs, make_ddim_coeffs,
)


class NumpyUniPC:
    """Direct stateful port of the UniPC-p multistep algorithm (order<=2)."""

    def __init__(self, schedule, num_steps, solver_order=2):
        self.s = schedule
        self.order = solver_order
        self.ts = schedule.inference_timesteps(num_steps)
        self.K = len(self.ts)
        self.model_outputs = [None] * solver_order
        self.timestep_list = [None] * solver_order
        self.lower_order_nums = 0
        self.last_sample = None
        self.this_order = None

    def _coeffs(self, h):
        hh = -h
        phi1 = np.expm1(hh)
        B_h = np.expm1(hh)
        h_phi_k = phi1 / hh - 1
        b = []
        fact = 1
        for i in range(1, 3):
            b.append(h_phi_k * fact / B_h)
            fact *= i + 1
            h_phi_k = h_phi_k / hh - 1 / fact
        return phi1, B_h, b

    def _update(self, x_base, t, s0, m0, extra_ms, extra_ts, order,
                final_d1=None):
        lam, al, sg = self.s.lambda_t, self.s.alpha_t, self.s.sigma_t
        h = lam[t] - lam[s0]
        phi1, B_h, b = self._coeffs(h)
        rks, D1s = [], []
        for mi, si in zip(extra_ms, extra_ts):
            rk = (lam[si] - lam[s0]) / h
            rks.append(rk)
            D1s.append((mi - m0) / rk)
        rks.append(1.0)
        rks = np.array(rks)
        R = np.stack([rks ** 0, rks ** 1])
        b = np.array(b)
        x_t_ = sg[t] / sg[s0] * x_base - al[t] * phi1 * m0
        if final_d1 is not None:  # corrector
            if order == 1:
                rhos = np.array([0.5])
            else:
                rhos = np.linalg.solve(R[:order, :order], b[:order])
            res = sum(r * d for r, d in zip(rhos[:-1], D1s))
            return x_t_ - al[t] * B_h * (res + rhos[-1] * final_d1)
        else:  # predictor
            if len(D1s) > 0:
                if order == 2:
                    rhos = np.array([0.5])
                else:
                    rhos = np.linalg.solve(R[:order - 1, :order - 1], b[:order - 1])
                res = sum(r * d for r, d in zip(rhos, D1s))
            else:
                res = 0.0
            return x_t_ - al[t] * B_h * res

    def step(self, eps, step_index, sample):
        t = int(self.ts[step_index])
        al, sg = self.s.alpha_t, self.s.sigma_t
        m = (sample - sg[t] * eps) / al[t]  # x0 prediction

        if step_index > 0 and self.last_sample is not None:
            s0 = self.timestep_list[-1]
            m0 = self.model_outputs[-1]
            extra = ([], [])
            if self.this_order >= 2:
                extra = ([self.model_outputs[-2]], [self.timestep_list[-2]])
            sample = self._update(self.last_sample, t, s0, m0, *extra,
                                  order=self.this_order, final_d1=m - m0)

        prev_t = int(self.ts[step_index + 1]) if step_index < self.K - 1 else 0
        self.model_outputs = self.model_outputs[1:] + [m]
        self.timestep_list = self.timestep_list[1:] + [t]
        this_order = min(self.order, self.K - step_index)
        self.this_order = min(this_order, self.lower_order_nums + 1)
        self.last_sample = sample
        extra = ([], [])
        if self.this_order >= 2:
            extra = ([self.model_outputs[-2]], [self.timestep_list[-2]])
        x = self._update(sample, prev_t, t, m, *extra, order=self.this_order)
        if self.lower_order_nums < self.order:
            self.lower_order_nums += 1
        return x


def toy_model(x, t):
    """A fake epsilon model with nontrivial t and x dependence."""
    return 0.3 * x + 0.1 * np.sin(x * 3.0) + 0.001 * t


@pytest.mark.parametrize("K", [3, 5, 20])
def test_unipc_matches_reference_algorithm(K):
    s = NoiseSchedule.create()
    coeffs = make_unipc_coeffs(s, K)
    ref = NumpyUniPC(s, K)
    assert (coeffs.timesteps == ref.ts).all()

    rng = np.random.default_rng(0)
    x_ref = rng.normal(size=(2, 4)).astype(np.float64)

    # exact check: replicate the branchless step in float64 numpy
    x_np = x_ref.copy()
    st_np = {k: np.zeros_like(x_ref) for k in ("x_last", "m1", "m2")}
    # jax check (float32): same eps inputs, so only rounding differs
    x_jax = jnp.asarray(x_ref, jnp.float32)
    state = coeffs.init_state(x_jax.shape, jnp.float32)

    for i in range(coeffs.num_steps):
        t = int(coeffs.timesteps[i])
        eps = toy_model(x_ref, t)
        x_ref = ref.step(eps, i, x_ref)
        # numpy replica of UniPCCoeffs.step
        c = coeffs
        m = c.cv_a[i] * x_np - c.cv_b[i] * eps
        m1, m2 = st_np["m1"], st_np["m2"]
        x_c = (c.c_a[i] * st_np["x_last"] - c.c_b[i] * m1
               - c.c_d[i] * (m2 - m1) - c.c_e[i] * (m - m1))
        x_np = c.use_c[i] * x_c + (1 - c.use_c[i]) * x_np
        st_np = {"x_last": x_np, "m1": m, "m2": m1}
        x_np = c.p_a[i] * x_np - c.p_b[i] * m - c.p_c[i] * (m1 - m)
        np.testing.assert_allclose(x_np, x_ref, rtol=1e-10,
                                   err_msg=f"step {i} (numpy)")
        x_jax, state = coeffs.step(i, x_jax, jnp.asarray(eps, jnp.float32),
                                   state)
        np.testing.assert_allclose(np.asarray(x_jax), x_ref, rtol=5e-3,
                                   atol=1e-4, err_msg=f"step {i} (jax f32)")


def test_unipc_order1():
    s = NoiseSchedule.create()
    coeffs = make_unipc_coeffs(s, 6, solver_order=1)
    ref = NumpyUniPC(s, 6, solver_order=1)
    x_ref = np.ones((3,))
    x_jax = jnp.asarray(x_ref, jnp.float32)
    state = coeffs.init_state(x_jax.shape, jnp.float32)
    for i in range(coeffs.num_steps):
        t = int(coeffs.timesteps[i])
        eps = toy_model(x_ref, t)
        x_ref = ref.step(eps, i, x_ref)
        x_jax, state = coeffs.step(i, x_jax,
                                   jnp.asarray(eps, jnp.float32), state)
    np.testing.assert_allclose(np.asarray(x_jax), x_ref, rtol=5e-3, atol=1e-4)


def test_ddim_terminal_is_x0_prediction():
    """At the last step (prev_t := clean), DDIM returns the x0 prediction."""
    s = NoiseSchedule.create()
    coeffs = make_ddim_coeffs(s, 4)
    i = coeffs.num_steps - 1
    t = int(coeffs.timesteps[i])
    x = jnp.asarray(np.random.default_rng(1).normal(size=(5,)))
    eps = jnp.asarray(np.random.default_rng(2).normal(size=(5,)))
    got, _ = coeffs.step(i, x, eps, {})
    want = (x - s.sigma_t[t] * eps) / s.alpha_t[t]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_inference_timesteps_grid():
    s = NoiseSchedule.create()
    ts = s.inference_timesteps(20)
    # diffusers grid: linspace(0, 999, K+1).round()[::-1][:-1] — the final 0
    # is dropped; the last predictor step targets t=0 via prev_t.
    assert ts[0] == 999 and ts[-1] == 50
    assert len(ts) == 20
    assert (np.diff(ts) < 0).all()
