"""L-BFGS correctness: quadratic with known optimum + parity vs torch.optim.LBFGS."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from cistar_tpu.ops.lbfgs import lbfgs_minimize


import pytest

pytestmark = pytest.mark.fast

def test_quadratic_converges():
    A = jnp.asarray(np.diag(np.linspace(1.0, 10.0, 8)).astype(np.float32))
    b = jnp.arange(8, dtype=jnp.float32)

    def loss(x):
        return 0.5 * x @ A @ x - b @ x

    x0 = jnp.zeros(8)
    x, final_loss, losses = jax.jit(
        lambda x0: lbfgs_minimize(loss, x0, max_iters=50, history_size=10)
    )(x0)
    x_star = jnp.linalg.solve(A, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_star), rtol=1e-4, atol=1e-4)
    assert losses[-1] <= losses[0]


def test_rosenbrock_matches_torch_lbfgs():
    """Same iteration count, same trajectory class as torch LBFGS (no line search)."""

    def np_loss_t(v):
        return (1 - v[0]) ** 2 + 100 * (v[1] - v[0] ** 2) ** 2

    # torch run: count closure evals like the reference loop (engine/utils.py:28-43)
    v = torch.tensor([-0.5, 0.5], requires_grad=True)
    opt = torch.optim.LBFGS([v], lr=0.1, max_iter=20, history_size=10)
    iters = [0]
    while iters[0] < 60:
        def closure():
            opt.zero_grad()
            l = np_loss_t(v)
            l.backward()
            iters[0] += 1
            return l
        opt.step(closure)
    torch_final = np_loss_t(v).item()

    def jloss(x):
        return (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2

    x0 = jnp.asarray([-0.5, 0.5], jnp.float32)
    x, final_loss, _ = jax.jit(
        lambda x0: lbfgs_minimize(jloss, x0, max_iters=60, lr=0.1, history_size=10)
    )(x0)
    # Both should have substantially minimized; trajectories may differ in tail.
    assert float(final_loss) < 1e-2 or float(final_loss) <= torch_final * 2 + 1e-3


def test_pytree_input():
    def loss(tree):
        return jnp.sum(jnp.square(tree["a"] - 3.0)) + jnp.sum(jnp.square(tree["b"] + 1.0))

    x0 = {"a": jnp.zeros((2, 2)), "b": jnp.zeros(3)}
    x, final_loss, _ = jax.jit(
        lambda x0: lbfgs_minimize(loss, x0, max_iters=20, history_size=5)
    )(x0)
    np.testing.assert_allclose(np.asarray(x["a"]), 3.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(x["b"]), -1.0, atol=1e-4)


def test_direction_matches_naive_two_loop(rng):
    """Matrix-form direction == textbook sequential two-loop recursion."""
    import jax.numpy as jnp
    from cistar_tpu.ops.lbfgs import LBFGSState, _direction

    n, m, count, head = 12, 6, 4, 2  # wrapped ring: slots 4,5,0,1 oldest->newest
    S = np.zeros((m, n), np.float32)
    Y = np.zeros((m, n), np.float32)
    rho = np.zeros(m, np.float32)
    order = [(head - count + i) % m for i in range(count)]  # oldest -> newest
    pairs = []
    for slot in order:
        s = rng.randn(n).astype(np.float32)
        y = s * rng.uniform(0.5, 2.0) + 0.1 * rng.randn(n).astype(np.float32)
        if y @ s <= 1e-10:
            y = s.copy()
        S[slot], Y[slot], rho[slot] = s, y, 1.0 / (y @ s)
        pairs.append((s, y, 1.0 / (y @ s)))
    g = rng.randn(n).astype(np.float32)

    # naive two-loop (newest first backward, oldest first forward)
    q = g.copy()
    alphas = []
    for s, y, r in reversed(pairs):
        a = r * (s @ q)
        q = q - a * y
        alphas.append(a)
    alphas = alphas[::-1]
    s_l, y_l, r_l = pairs[-1]
    gamma = (y_l @ s_l) / (y_l @ y_l)
    r_vec = gamma * q
    for (s, y, r), a in zip(pairs, alphas):
        b = r * (y @ r_vec)
        r_vec = r_vec + s * (a - b)
    d_ref = -r_vec

    state = LBFGSState(
        x=jnp.zeros(n), g=jnp.asarray(g), loss=jnp.float32(0),
        hist=jnp.asarray(np.concatenate([S, Y], axis=0)),
        rho=jnp.asarray(rho),
        sy=jnp.asarray(S @ Y.T), yy=jnp.asarray(Y @ Y.T),
        sg=jnp.asarray(S @ g), yg=jnp.asarray(Y @ g),
        head=jnp.int32(head), count=jnp.int32(count),
        k=jnp.int32(count), done=jnp.asarray(False),
    )
    d = np.asarray(_direction(state, m))
    np.testing.assert_allclose(d, d_ref, rtol=1e-4, atol=1e-5)
