"""Step-controller parity against torchdiffeq 0.0.1 (the version the
reference pins: /root/reference/README.md:22 "pip install torchdiffeq==0.0.1
(note the version is important)").

The oracle below is an independent numpy transcription of that release's
published dopri5 algorithm (torchdiffeq/_impl/{dopri5,misc}.py at v0.0.1):

  - Hairer initial-step selection with per-tensor RMS norms and max-over-
    tensors reduction, order-4 exponent 1/5 (misc._select_initial_step)
  - error ratio: per-tensor mean of squared (err / (atol + rtol *
    max(|y0|,|y1|))); accept iff all tensors <= 1
    (misc._compute_error_ratio)
  - step update: dt / clamp(sqrt(max ratio)^(1/5) / safety, 1/ifactor,
    1/dfactor) with dfactor := 1 on accepted steps, safety=0.9,
    ifactor=10, dfactor=0.2 (misc._optimal_step_size)
  - free stepping past the last request time + quartic dense-output
    interpolation at request times (Dopri5Solver.advance /
    _interp_fit_dopri5), FSAL k7 -> next k1
  - NFE: 1 (f0) + 1 (initial-step probe) + 6 per attempted step,
    rejected steps included (ODEfunc-style call counting)

NFE equality between caspr_tpu.ops.odeint and this oracle pins down every
controller decision (each divergence would change the accept/reject
sequence and show up as a step-count difference).  Run on CaSPR-shaped
problems at the model's tolerances (latent ODE 1e-3, CNF 1e-5).
"""

import numpy as np
import jax
import jax.numpy as jnp

from caspr_tpu.ops import odeint

_SAFETY, _IFACTOR, _DFACTOR = 0.9, 10.0, 0.2

# Dormand-Prince tableau (identical constants to torchdiffeq's
# _DORMAND_PRINCE_SHAMPINE_TABLEAU; public Butcher-tableau data).
_C = [1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0]
_A = [
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_B = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0]
_B_LOW = [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
          187 / 2100, 1 / 40]
_C_MID = [
    6025192743 / 30085553152 / 2, 0.0, 51252292925 / 65400821598 / 2,
    -2691868925 / 45128329728 / 2, 187940372067 / 1594534317056 / 2,
    -1776094331 / 19743644256 / 2, 11237099 / 235043384 / 2,
]


def _rms(x):
    return float(np.sqrt(np.mean(np.square(x))))


class _Counter:
    def __init__(self, f):
        self.f = f
        self.nfe = 0

    def __call__(self, t, y):
        self.nfe += 1
        return self.f(t, y)


def _select_initial_step(fun, t0, y0, order, rtol, atol, f0):
    """misc._select_initial_step at v0.0.1 (tuple state, max over tensors)."""
    scale = [a + np.abs(y) * r for y, a, r in zip(y0, atol, rtol)]
    d0 = [_rms(y / s) for y, s in zip(y0, scale)]
    d1 = [_rms(f / s) for f, s in zip(f0, scale)]
    if max(d0) < 1e-5 or max(d1) < 1e-5:
        h0 = 1e-6
    else:
        h0 = 0.01 * max(d0) / max(d1)
    y1 = [y + h0 * f for y, f in zip(y0, f0)]
    f1 = fun(t0 + h0, y1)
    d2 = [_rms((g - f) / s) / h0 for g, f, s in zip(f1, f0, scale)]
    if max(d1) <= 1e-15 and max(d2) <= 1e-15:
        h1 = max(1e-6, h0 * 1e-3)
    else:
        h1 = (0.01 / max(d1 + d2)) ** (1.0 / (order + 1))
    return min(100 * h0, h1)


def _optimal_step_size(last_step, mean_sq_ratios, accepted):
    """misc._optimal_step_size at v0.0.1."""
    ratio = max(mean_sq_ratios)
    if ratio == 0:
        return last_step * _IFACTOR
    dfactor = 1.0 if accepted else _DFACTOR
    error_ratio = np.sqrt(ratio)
    factor = max(1.0 / _IFACTOR,
                 min(error_ratio ** 0.2 / _SAFETY, 1.0 / dfactor))
    return last_step / factor


def _interp_fit(y0, y1, k, dt):
    """_interp_fit_dopri5: quartic through y0, y_mid, y1 w/ slopes f0, f1."""
    coeffs = []
    for leaf in range(len(y0)):
        ks = [k[i][leaf] for i in range(7)]
        y_mid = y0[leaf] + dt * sum(c * kk for c, kk in zip(_C_MID, ks))
        f0, f1 = ks[0], ks[6]
        hf0, hf1 = dt * f0, dt * f1
        a = y1[leaf] - y0[leaf] - hf0
        b = y_mid - y0[leaf] - 0.5 * hf0
        c = hf1 - hf0
        c4 = -8.0 * a + 16.0 * b + 2.0 * c
        c3 = 14.0 * a - 32.0 * b - 3.0 * c
        c2 = -5.0 * a + 16.0 * b + c
        coeffs.append((y0[leaf], hf0, c2, c3, c4))
    return coeffs


def _interp_eval(coeffs, t0, t1, t):
    th = (t - t0) / (t1 - t0)
    out = []
    for c0, c1, c2, c3, c4 in coeffs:
        out.append(c0 + th * (c1 + th * (c2 + th * (c3 + th * c4))))
    return out


def torchdiffeq_001_dopri5(fun, y0, ts, rtol, atol):
    """Tuple-state dopri5 exactly following torchdiffeq 0.0.1's control
    flow.  fun(t, y_tuple) -> dy tuple; returns (ys list per time, nfe)."""
    fun = _Counter(fun)
    if np.isscalar(rtol):
        rtol = [rtol] * len(y0)
    if np.isscalar(atol):
        atol = [atol] * len(y0)
    t0 = float(ts[0])
    f0 = fun(t0, y0)
    dt = _select_initial_step(fun, t0, y0, 4, rtol, atol, f0)

    y, f, t = list(y0), list(f0), t0
    t_prev = t0
    interp = None
    outs = [list(y0)]

    for t_req in ts[1:]:
        t_req = float(t_req)
        while t_req > t:
            # one attempted RK step from (t, y) with FSAL slope f
            k = [f]
            for i in range(6):
                ti = t + _C[i] * dt
                yi = [
                    yl + dt * sum(a * k[j][l] for j, a in enumerate(_A[i]))
                    for l, yl in enumerate(y)
                ]
                k.append(fun(ti, yi))
            y1 = [
                yl + dt * sum(b * k[j][l] for j, b in enumerate(_B))
                for l, yl in enumerate(y)
            ]
            err = [
                dt * sum((b - bl) * k[j][l]
                         for j, (b, bl) in enumerate(zip(_B, _B_LOW)))
                for l in range(len(y))
            ]
            ratios = [
                float(np.mean(np.square(
                    e / (a + r * np.maximum(np.abs(yl), np.abs(y1l)))
                )))
                for e, a, r, yl, y1l in zip(err, atol, rtol, y, y1)
            ]
            accept = all(rr <= 1.0 for rr in ratios)
            if accept:
                interp = _interp_fit(y, y1, k, dt)
                t_prev, t = t, t + dt
                y, f = y1, k[6]  # FSAL
            dt = _optimal_step_size(dt, ratios, accept)
        if t_req == t0:
            outs.append(list(y0))
        else:
            outs.append(_interp_eval(interp, t_prev, t, t_req))
    return outs, fun.nfe


# ------------------------- parity tests ------------------------------------


def _run_ours(func, y0_tree, ts, rtol, atol):
    ys, nfe = odeint(
        func, jax.tree_util.tree_map(jnp.asarray, y0_tree), jnp.asarray(ts),
        None, rtol=rtol, atol=atol,
    )
    return ys, float(nfe)


def test_nfe_parity_latent_ode_shape():
    """CaSPR latent-ODE setting: tanh-MLP dynamics, (B, 16) state,
    rtol=atol=1e-3 (reference latent_ode_model.py:38,83)."""
    rng = np.random.RandomState(0)
    w1 = (rng.randn(16, 32) * 0.1).astype(np.float32)
    w2 = (rng.randn(32, 16) * 0.1).astype(np.float32)
    y0 = rng.randn(4, 16).astype(np.float32)
    ts = np.linspace(0.0, 1.0, 6).astype(np.float32)

    def f_np(t, y):
        return [np.tanh(y[0] @ w1) @ w2]

    def f_jax(t, y, args):
        return (jnp.tanh(y[0] @ w1) @ w2,)

    outs, nfe_oracle = torchdiffeq_001_dopri5(f_np, [y0], ts, 1e-3, 1e-3)
    ys, nfe_ours = _run_ours(f_jax, (y0,), ts, 1e-3, 1e-3)
    assert abs(nfe_ours - nfe_oracle) <= 6.0, (nfe_ours, nfe_oracle)
    np.testing.assert_allclose(
        np.asarray(ys[0][-1]), outs[-1][0], rtol=1e-3, atol=1e-4
    )


def test_nfe_parity_cnf_shape_tuple_state():
    """CNF setting: tuple state (x, logp) at atol=rtol=1e-5 with
    per-tensor tolerances (reference cnf.py:80-84)."""
    rng = np.random.RandomState(1)
    w = (rng.randn(3, 3) * 0.4).astype(np.float32)
    x0 = rng.randn(8, 3).astype(np.float32)
    lp0 = np.zeros((8, 1), np.float32)
    ts = np.array([0.0, 0.5], np.float32)

    def f_np(t, y):
        dx = np.tanh(y[0] @ w)
        dlp = -np.sum(dx, axis=-1, keepdims=True)
        return [dx, dlp]

    def f_jax(t, y, args):
        dx = jnp.tanh(y[0] @ w)
        return (dx, -jnp.sum(dx, axis=-1, keepdims=True))

    outs, nfe_oracle = torchdiffeq_001_dopri5(f_np, [x0, lp0], ts, 1e-5, 1e-5)
    ys, nfe_ours = _run_ours(f_jax, (x0, lp0), ts, 1e-5, 1e-5)
    assert abs(nfe_ours - nfe_oracle) <= 6.0, (nfe_ours, nfe_oracle)
    np.testing.assert_allclose(
        np.asarray(ys[0][-1]), outs[-1][0], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ys[1][-1]), outs[-1][1], rtol=1e-4, atol=1e-5
    )


def test_nfe_parity_across_tolerances_and_spans():
    """Sweep tolerances/spans; NFE must track the oracle everywhere."""
    rng = np.random.RandomState(2)
    A = (rng.randn(6, 6) * 0.5).astype(np.float32)
    A = A - A.T
    y0 = rng.randn(2, 6).astype(np.float32)

    def f_np(t, y):
        return [y[0] @ A]

    def f_jax(t, y, args):
        return (y[0] @ A,)

    for tol in (1e-3, 1e-5):
        for t_end in (0.5, 2.0):
            ts = np.linspace(0.0, t_end, 4).astype(np.float32)
            _, nfe_oracle = torchdiffeq_001_dopri5(f_np, [y0], ts, tol, tol)
            _, nfe_ours = _run_ours(f_jax, (y0,), ts, tol, tol)
            assert abs(nfe_ours - nfe_oracle) <= 6.0, (
                tol, t_end, nfe_ours, nfe_oracle
            )
