"""ODE solver tests: closed-form linear ODEs, oracle comparison against
jax.experimental.ode, adjoint gradient checks against finite differences
and against differentiating a fixed-step RK4 (SURVEY.md §4 test plan)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from caspr_tpu.ops import odeint, odeint_adjoint


def linear_func(t, y, args):
    return args["A"] @ y


def test_scalar_exponential():
    func = lambda t, y, args: args * y
    ts = jnp.linspace(0.0, 2.0, 9)
    ys, nfe = odeint(func, jnp.array([1.0]), ts, jnp.asarray(-0.7), rtol=1e-6, atol=1e-8)
    want = np.exp(-0.7 * np.asarray(ts))[:, None]
    np.testing.assert_allclose(np.asarray(ys), want, rtol=1e-4, atol=1e-6)
    assert float(nfe) > 0


def test_linear_system_matrix_exponential():
    rng = np.random.RandomState(0)
    A = rng.randn(4, 4).astype(np.float32) * 0.5
    A = A - A.T  # skew: bounded dynamics
    y0 = rng.randn(4).astype(np.float32)
    ts = jnp.array([0.0, 0.3, 0.9, 1.5])
    ys, _ = odeint(linear_func, jnp.asarray(y0), ts, {"A": jnp.asarray(A)}, rtol=1e-6, atol=1e-8)
    import scipy.linalg as sla

    for i, t in enumerate(np.asarray(ts)):
        want = sla.expm(A * t) @ y0
        np.testing.assert_allclose(np.asarray(ys)[i], want, rtol=2e-4, atol=1e-5)


def test_duplicate_and_initial_times():
    func = lambda t, y, args: -y
    ts = jnp.array([0.0, 0.0, 0.5, 0.5, 1.0])
    ys, _ = odeint(func, jnp.array([2.0]), ts, None, rtol=1e-6, atol=1e-8)
    want = 2.0 * np.exp(-np.asarray(ts))
    np.testing.assert_allclose(np.asarray(ys)[:, 0], want, rtol=1e-4)


def test_zero_span():
    func = lambda t, y, args: -y
    ts = jnp.array([0.3, 0.3])
    ys, _ = odeint(func, jnp.array([2.0]), ts, None)
    np.testing.assert_allclose(np.asarray(ys), [[2.0], [2.0]])


def test_pytree_state():
    func = lambda t, y, args: {"a": -y["a"], "b": 0.5 * y["b"]}
    ts = jnp.array([0.0, 1.0])
    ys, _ = odeint(func, {"a": jnp.ones(3), "b": jnp.ones(2)}, ts, None, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ys["a"][1]), np.exp(-1.0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ys["b"][1]), np.exp(0.5), rtol=1e-4)


def test_against_jax_experimental_ode():
    from jax.experimental.ode import odeint as jax_odeint

    def f(t, y, args):
        return jnp.stack([y[1], -jnp.sin(y[0]) - 0.1 * y[1] + jnp.sin(t)])

    y0 = jnp.array([0.5, 0.0])
    ts = jnp.linspace(0.0, 5.0, 11)
    ours, _ = odeint(f, y0, ts, None, rtol=1e-6, atol=1e-8)
    ref = jax_odeint(lambda y, t: f(t, y, None), y0, ts, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_nfe_scales_with_tolerance():
    def f(t, y, args):
        return jnp.stack([y[1], -100.0 * y[0]])  # stiff-ish oscillator

    y0 = jnp.array([1.0, 0.0])
    ts = jnp.array([0.0, 1.0])
    _, nfe_loose = odeint(f, y0, ts, None, rtol=1e-3, atol=1e-3)
    _, nfe_tight = odeint(f, y0, ts, None, rtol=1e-8, atol=1e-10)
    assert float(nfe_tight) > float(nfe_loose)


# ----------------------------- adjoint ------------------------------------


def test_adjoint_matches_forward():
    func = lambda t, y, args: args["A"] @ jnp.tanh(y)
    rng = np.random.RandomState(1)
    A = jnp.asarray(rng.randn(3, 3).astype(np.float32) * 0.4)
    y0 = jnp.asarray(rng.randn(3).astype(np.float32))
    ts = jnp.array([0.0, 0.7, 1.3])
    ys1, _ = odeint(func, y0, ts, {"A": A}, rtol=1e-6, atol=1e-8)
    ys2, _ = odeint_adjoint(func, y0, ts, {"A": A}, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ys1), np.asarray(ys2), rtol=1e-6)


def _loss(y0, ts, args, use_adjoint=True):
    func = lambda t, y, a: a["A"] @ jnp.tanh(y) + a["b"]
    ys, _ = odeint_adjoint(func, y0, ts, args, rtol=1e-8, atol=1e-10)
    return jnp.sum(jnp.sin(ys) * jnp.arange(1.0, 1.0 + ys.size).reshape(ys.shape))


def test_adjoint_grads_vs_finite_difference():
    rng = np.random.RandomState(2)
    A = rng.randn(3, 3).astype(np.float32) * 0.3
    b = rng.randn(3).astype(np.float32) * 0.1
    y0 = rng.randn(3).astype(np.float32)
    ts = np.array([0.0, 0.4, 1.0], np.float32)
    args = {"A": jnp.asarray(A), "b": jnp.asarray(b)}

    g_y0, g_ts, g_args = jax.grad(_loss, argnums=(0, 1, 2))(
        jnp.asarray(y0), jnp.asarray(ts), args
    )

    eps = 1e-3

    def fd(f, x):
        g = np.zeros_like(x)
        flat = x.reshape(-1)
        for i in range(flat.size):
            xp = flat.copy()
            xm = flat.copy()
            xp[i] += eps
            xm[i] -= eps
            g.reshape(-1)[i] = (f(xp.reshape(x.shape)) - f(xm.reshape(x.shape))) / (
                2 * eps
            )
        return g

    f_y0 = lambda v: float(_loss(jnp.asarray(v), jnp.asarray(ts), args))
    np.testing.assert_allclose(np.asarray(g_y0), fd(f_y0, y0), rtol=2e-2, atol=2e-3)

    f_A = lambda v: float(
        _loss(jnp.asarray(y0), jnp.asarray(ts), {"A": jnp.asarray(v), "b": args["b"]})
    )
    np.testing.assert_allclose(np.asarray(g_args["A"]), fd(f_A, A), rtol=2e-2, atol=2e-3)

    f_b = lambda v: float(
        _loss(jnp.asarray(y0), jnp.asarray(ts), {"A": args["A"], "b": jnp.asarray(v)})
    )
    np.testing.assert_allclose(np.asarray(g_args["b"]), fd(f_b, b), rtol=2e-2, atol=2e-3)

    # time gradients: perturb final and middle times
    f_ts = lambda v: float(_loss(jnp.asarray(y0), jnp.asarray(v), args))
    np.testing.assert_allclose(np.asarray(g_ts), fd(f_ts, ts), rtol=2e-2, atol=2e-3)


def test_adjoint_under_jit_and_tuple_state():
    def func(t, y, a):
        x, logp = y
        return (a * x, -jnp.sum(x, keepdims=True))

    @jax.jit
    def loss(a):
        ts = jnp.array([0.0, 1.0])
        (xs, lps), nfe = odeint_adjoint(
            func, (jnp.ones(3), jnp.zeros(1)), ts, a, rtol=1e-6, atol=1e-8
        )
        return jnp.sum(xs[1]) + jnp.sum(lps[1])

    g = jax.grad(loss)(jnp.asarray(-0.3))
    # d/da [3 e^a] + d/da [-3 (e^a - 1)/a]
    a = -0.3
    want = 3 * np.exp(a) - 3 * (np.exp(a) * a - (np.exp(a) - 1)) / a**2
    np.testing.assert_allclose(float(g), want, rtol=1e-3)


def test_long_integration_energy_conservation():
    """Rotation dynamics conserve |y|; the solver must track it over a long
    horizon at its tolerance scale."""
    w = 3.0

    def f(t, y, args):
        return jnp.stack([-w * y[1], w * y[0]])

    y0 = jnp.array([1.0, 0.0])
    ts = jnp.linspace(0.0, 20.0, 5)
    ys, nfe = odeint(f, y0, ts, None, rtol=1e-6, atol=1e-8)
    radii = np.linalg.norm(np.asarray(ys), axis=1)
    np.testing.assert_allclose(radii, 1.0, rtol=1e-4)
    assert float(nfe) > 100  # ~10 rotations need real steps


def test_stiffish_decay_stability():
    """Fast decay: solution must stay bounded and land on the asymptote."""

    def f(t, y, args):
        return -50.0 * (y - jnp.cos(t))

    ys, _ = odeint(f, jnp.array([2.0]), jnp.array([0.0, 3.0]), None,
                   rtol=1e-6, atol=1e-8)
    # quasi-static solution ~ cos(t) for large decay rate
    assert abs(float(ys[1][0]) - np.cos(3.0)) < 0.05


def test_adjoint_nfe_and_fwd_nfe_reported():
    func = lambda t, y, args: args * y
    _, nfe = odeint_adjoint(
        func, jnp.ones(2), jnp.array([0.0, 1.0]), jnp.asarray(-0.5),
        rtol=1e-6, atol=1e-8,
    )
    assert float(nfe) >= 8.0


def test_backward_nfe_via_sink_gradient():
    """The nfe_sink gradient reports adjoint-pass dynamics evaluations
    (reference reads NFE after loss.backward(), train_utils.py:142-148)."""
    func = lambda t, y, args: args * y

    def loss(y0, sink):
        ys, _ = odeint_adjoint(
            func, y0, jnp.array([0.0, 0.5, 1.0]), jnp.asarray(-0.5),
            rtol=1e-6, atol=1e-8, nfe_sink=sink,
        )
        return jnp.sum(ys[1:] ** 2)

    y0 = jnp.ones(3)
    (g_y0, nfe_bwd) = jax.grad(loss, argnums=(0, 1))(y0, jnp.zeros(()))
    nfe_bwd = float(nfe_bwd)
    # two intervals: each >= (2 init + 6 per step) aug evals + 1 (f_i), +1 f_0
    assert nfe_bwd >= 2 * 9 + 1
    assert nfe_bwd == int(nfe_bwd)  # a whole number of evaluations
    # the sink must not perturb the real gradients
    g_ref = jax.grad(
        lambda y: jnp.sum(
            odeint_adjoint(
                func, y, jnp.array([0.0, 0.5, 1.0]), jnp.asarray(-0.5),
                rtol=1e-6, atol=1e-8,
            )[0][1:]
            ** 2
        )
    )(y0)
    np.testing.assert_allclose(np.asarray(g_y0), np.asarray(g_ref), rtol=1e-6)


def test_backward_nfe_zero_for_identity_interval():
    func = lambda t, y, args: args * y
    nfe_bwd = jax.grad(
        lambda s: jnp.sum(
            odeint_adjoint(
                func, jnp.ones(2), jnp.array([0.0]), jnp.asarray(-0.5),
                nfe_sink=s,
            )[0]
        ),
    )(jnp.zeros(()))
    assert float(nfe_bwd) == 0.0


# ------------------- discrete (backprop-through-solver) mode ---------------


def test_discrete_matches_odeint_values():
    """The checkpointed-scan integrator runs the same step math as the
    while-loop one; values and NFE must agree tightly."""
    from caspr_tpu.ops import odeint_discrete

    func = lambda t, y, args: args["A"] @ jnp.tanh(y)
    rng = np.random.RandomState(5)
    A = jnp.asarray(rng.randn(3, 3).astype(np.float32) * 0.4)
    y0 = jnp.asarray(rng.randn(3).astype(np.float32))
    ts = jnp.array([0.0, 0.7, 1.3])
    ys1, nfe1 = odeint(func, y0, ts, {"A": A}, rtol=1e-6, atol=1e-8)
    ys2, nfe2 = odeint_discrete(
        func, y0, ts, {"A": A}, rtol=1e-6, atol=1e-8, num_steps=64
    )
    np.testing.assert_allclose(np.asarray(ys1), np.asarray(ys2), rtol=1e-6)
    assert float(nfe1) == float(nfe2)


def test_discrete_grads_vs_adjoint_and_fd():
    """Discrete-mode gradients must agree with the continuous adjoint at
    tight tolerances and with finite differences."""
    from caspr_tpu.ops import odeint_discrete

    func = lambda t, y, a: a["A"] @ jnp.tanh(y) + a["b"]
    rng = np.random.RandomState(6)
    A = rng.randn(3, 3).astype(np.float32) * 0.3
    b = rng.randn(3).astype(np.float32) * 0.1
    y0 = rng.randn(3).astype(np.float32)
    ts = np.array([0.0, 0.4, 1.0], np.float32)
    args = {"A": jnp.asarray(A), "b": jnp.asarray(b)}

    def loss_disc(y0, ts, args):
        ys, _ = odeint_discrete(
            func, y0, ts, args, rtol=1e-8, atol=1e-10, num_steps=128
        )
        return jnp.sum(
            jnp.sin(ys) * jnp.arange(1.0, 1.0 + ys.size).reshape(ys.shape)
        )

    g_y0, g_ts, g_args = jax.grad(loss_disc, argnums=(0, 1, 2))(
        jnp.asarray(y0), jnp.asarray(ts), args
    )
    ga_y0, ga_ts, ga_args = jax.grad(_loss, argnums=(0, 1, 2))(
        jnp.asarray(y0), jnp.asarray(ts), args
    )
    np.testing.assert_allclose(np.asarray(g_y0), np.asarray(ga_y0),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_args["A"]),
                               np.asarray(ga_args["A"]), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_args["b"]),
                               np.asarray(ga_args["b"]), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_ts), np.asarray(ga_ts),
                               rtol=2e-3, atol=1e-4)

    eps = 1e-3

    def fd(f, x):
        g = np.zeros_like(x)
        flat = x.reshape(-1)
        for i in range(flat.size):
            xp = flat.copy()
            xm = flat.copy()
            xp[i] += eps
            xm[i] -= eps
            g.reshape(-1)[i] = (
                f(xp.reshape(x.shape)) - f(xm.reshape(x.shape))
            ) / (2 * eps)
        return g

    f_A = lambda v: float(loss_disc(
        jnp.asarray(y0), jnp.asarray(ts),
        {"A": jnp.asarray(v), "b": args["b"]}))
    np.testing.assert_allclose(np.asarray(g_args["A"]), fd(f_A, A),
                               rtol=2e-2, atol=2e-3)


def test_discrete_env_dispatch(monkeypatch):
    """CASPR_TPU_ODE_BWD=discrete must reroute odeint_adjoint callers and
    keep values identical; nfe_sink gradient becomes 0 in that mode."""
    func = lambda t, y, args: args * y
    y0 = jnp.ones(3)
    ts = jnp.array([0.0, 0.5, 1.0])

    def loss(y, sink):
        ys, _ = odeint_adjoint(
            func, y, ts, jnp.asarray(-0.5), rtol=1e-6, atol=1e-8,
            nfe_sink=sink,
        )
        return jnp.sum(ys[1:] ** 2)

    g_adj = jax.grad(loss, argnums=(0, 1))(y0, jnp.zeros(()))
    monkeypatch.setenv("CASPR_TPU_ODE_BWD", "discrete")
    g_disc = jax.grad(loss, argnums=(0, 1))(y0, jnp.zeros(()))
    np.testing.assert_allclose(
        np.asarray(g_disc[0]), np.asarray(g_adj[0]), rtol=1e-3
    )
    assert float(g_adj[1]) > 0.0  # adjoint mode reports backward NFE
    assert float(g_disc[1]) == 0.0  # discrete mode: no adjoint solve


def test_discrete_step_bound_exhaustion_safety_net():
    """When num_steps is too small to reach the last request time, the
    unfilled outputs must take the final integrator state (the same
    safety net as odeint's max_steps), not zeros."""
    from caspr_tpu.ops import odeint_discrete

    func = lambda t, y, args: args * y
    y0 = jnp.ones(2)
    ts = jnp.array([0.0, 5.0])
    ys, nfe = odeint_discrete(
        func, y0, ts, jnp.asarray(-0.8), rtol=1e-10, atol=1e-12, num_steps=2
    )
    out = np.asarray(ys)
    assert np.all(np.isfinite(out))
    assert out[1].max() < 1.0  # made some progress from y0 toward decay
    assert out[1].min() > np.exp(-0.8 * 5.0) - 1e-9  # but not converged
    # init probe + exactly 2 steps, plus the +0.5 exhaustion marker
    # (see ops/odeint.py::nfe_exhausted)
    assert float(nfe) == 2.0 + 12.0 + 0.5


def test_discrete_exhaustion_marker():
    """Step-bound exhaustion must surface as a +0.5 marker on the NFE
    count (pure device arithmetic — the r3 jax.debug.print mechanism was
    a host callback, rejected at runtime by the axon TPU backend and
    unable to cross-lower for jax.export)."""
    from caspr_tpu.ops import odeint_discrete
    from caspr_tpu.ops.odeint import nfe_exhausted

    func = lambda t, y, args: -50.0 * y  # stiff: needs many small steps
    y0 = jnp.ones((2,), jnp.float32)
    ts = jnp.array([0.0, 5.0])

    _, nfe_ok = odeint_discrete(func, y0, ts, None, num_steps=512)
    assert not nfe_exhausted(nfe_ok)
    assert float(nfe_ok) % 1.0 == 0.0

    _, nfe_bad = odeint_discrete(func, y0, ts, None, num_steps=4)
    assert nfe_exhausted(nfe_bad)
