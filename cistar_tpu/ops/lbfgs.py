"""Jit-compiled L-BFGS matching ``torch.optim.LBFGS`` semantics.

The reference drives Gatys style transfer with ``optim.LBFGS([image])`` and a
closure loop counting closure evaluations up to ``MAX_ITER``
(``IST/model/engine/utils.py:17-45``). torch's defaults there: ``lr=1``,
``max_iter=20`` per ``.step`` (state persists across steps, so 300 closure
evals ≡ 300 L-BFGS iterations), ``history_size=100``, **no line search**
(``line_search_fn=None``), curvature pairs kept only when ``yᵀs > 1e-10``,
and a first-iteration step scaling of ``min(1, 1/‖g‖₁)·lr``.

TPU-native design: the whole optimization is ONE ``lax.scan`` inside jit —
one compilation, zero per-iteration host round-trips (the reference pays a
Python closure + optimizer step per iteration). The classic two-loop
recursion is replaced by its algebraically identical **matrix form**: the
backward-loop alphas and forward-loop betas each solve a unit-lower-triangular
m×m system built from cached Gram matrices S·Yᵀ and Y·Yᵀ (maintained
incrementally, one row+column per accepted pair).

HBM discipline (the hot-loop profile at 1024² was history-bandwidth-bound,
``benchmarks/profile_gatys1024.json``): S and Y live in ONE ``(2m, n)``
buffer, and each iteration touches the full history exactly TWICE —
one ``Hᵀ·coef`` matvec producing the direction, and one ``H·[s y g]``
matmul producing every Gram row/column update AND the cached ``S·g``/``Y·g``
vectors the NEXT direction needs. There is no ``lax.cond`` on the first
iteration: with zero valid pairs every ρ is 0, the triangular systems
collapse to identity, γ = 1, and the direction reduces exactly to ``-g``.
Convergence tests (grad/step/loss tolerances) freeze the iterate by zeroing
the step rather than early-exiting, keeping the shape program static.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.flatten_util import ravel_pytree

_PREC = lax.Precision.HIGHEST  # history math stays true fp32


class LBFGSState(NamedTuple):
    x: jnp.ndarray          # flat iterate (n,)
    g: jnp.ndarray          # flat gradient at x (n,)
    loss: jnp.ndarray       # scalar loss at x
    hist: jnp.ndarray       # (2m, n) ring: rows [0, m) = S, rows [m, 2m) = Y
    rho: jnp.ndarray        # (m,) 1/(yᵀs)
    sy: jnp.ndarray         # (m, m) cached S·Yᵀ  (sy[i, j] = s_iᵀ y_j)
    yy: jnp.ndarray         # (m, m) cached Y·Yᵀ
    sg: jnp.ndarray         # (m,) cached S·g for the CURRENT g
    yg: jnp.ndarray         # (m,) cached Y·g for the CURRENT g
    head: jnp.ndarray       # int32 ring head (next write slot)
    count: jnp.ndarray      # int32 valid entries (≤ m)
    k: jnp.ndarray          # int32 iteration counter
    done: jnp.ndarray       # bool convergence latch


def _direction(state: LBFGSState, m: int) -> jnp.ndarray:
    """d = -H·g via the matrix form of the two-loop recursion.

    Processing orders: backward loop visits pairs newest→oldest, forward loop
    oldest→newest. With L = strict lower triangle of the order-permuted S·Yᵀ:

      (I + diag(ρ)·L) α = diag(ρ)·S·g               (backward-loop alphas)
      r₀ = γ (g − Yᵀα)
      (I + diag(ρ')·L') β = diag(ρ')·(Y·r₀ + L'·α)   (forward-loop betas)
      d  = −(r₀ + Sᵀ(α − β)) = −(γ·g + Hᵀ·[α−β; −γα])

    ``S·g`` and ``Y·g`` come from the carry caches (computed against the
    post-update history by the previous iteration); the ONLY full-history
    pass here is the final fused ``Hᵀ`` matvec. Rows past ``count`` have
    ρ = 0 and reduce to identity rows, so invalid ring slots — and the
    entire count == 0 first iteration, where this returns exactly ``-g`` —
    contribute nothing.
    """
    g, rho = state.g, state.rho
    head, count = state.head, state.count
    Sg, Yg = state.sg, state.yg

    idx = jnp.arange(m, dtype=jnp.int32)
    valid = idx < count
    ord_bwd = jnp.mod(head - 1 - idx, m)       # newest first
    ord_fwd = jnp.mod(head - count + idx, m)   # oldest first

    # ---- backward loop (alphas), newest-first order -----------------------
    rho_b = jnp.where(valid, rho[ord_bwd], 0.0)
    SY_b = state.sy[jnp.ix_(ord_bwd, ord_bwd)]
    L_b = jnp.tril(SY_b, k=-1)
    M1 = jnp.eye(m, dtype=g.dtype) + rho_b[:, None] * L_b
    rhs1 = rho_b * Sg[ord_bwd]
    alpha_b = jax.scipy.linalg.solve_triangular(M1, rhs1, lower=True)
    alpha = jnp.zeros((m,), g.dtype).at[ord_bwd].set(alpha_b)

    # ---- H0 scaling γ = (yᵀs)/(yᵀy) of the newest pair --------------------
    last = jnp.mod(head - 1, m)
    ys_last = jnp.where(count > 0, 1.0 / jnp.maximum(rho[last], 1e-38), 1.0)
    yy_last = state.yy[last, last]
    gamma = jnp.where(count > 0, ys_last / jnp.maximum(yy_last, 1e-38), 1.0)

    Yr0 = gamma * (Yg - jnp.matmul(state.yy, alpha, precision=_PREC))

    # ---- forward loop (betas), oldest-first order -------------------------
    rho_f = jnp.where(valid, rho[ord_fwd], 0.0)
    # (Y·Sᵀ)[i, j] = sy[j, i] in permuted order
    YS_f = state.sy[jnp.ix_(ord_fwd, ord_fwd)].T
    L_f = jnp.tril(YS_f, k=-1)
    alpha_f = alpha[ord_fwd]
    M2 = jnp.eye(m, dtype=g.dtype) + rho_f[:, None] * L_f
    rhs2 = rho_f * (Yr0[ord_fwd] + L_f @ alpha_f)
    beta_f = jax.scipy.linalg.solve_triangular(M2, rhs2, lower=True)
    beta = jnp.zeros((m,), g.dtype).at[ord_fwd].set(beta_f)

    # ---- single fused full-history pass -----------------------------------
    coef = jnp.concatenate([alpha - beta, -gamma * alpha])
    d = -(gamma * g + jnp.matmul(state.hist.T, coef.astype(state.hist.dtype),
                                 precision=_PREC).astype(jnp.float32))
    return d


def lbfgs_minimize(
    loss_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x0,
    max_iters: int,
    lr: float = 1.0,
    history_size: int = 100,
    tolerance_grad: float = 1e-7,
    tolerance_change: float = 1e-9,
    history_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Minimize ``loss_fn`` over a pytree ``x0`` with torch-LBFGS semantics.

    Returns ``(x_opt, final_loss, loss_history)``. Designed to be called under
    ``jax.jit`` (``max_iters`` static).
    """
    flat0, unravel = ravel_pytree(x0)
    flat0 = flat0.astype(jnp.float32)
    n = flat0.shape[0]
    m = int(history_size)

    def flat_loss(flat):
        return loss_fn(unravel(flat))

    value_and_grad = jax.value_and_grad(flat_loss)

    loss0, g0 = value_and_grad(flat0)
    init = LBFGSState(
        x=flat0,
        g=g0.astype(jnp.float32),
        loss=loss0.astype(jnp.float32),
        hist=jnp.zeros((2 * m, n), history_dtype),
        rho=jnp.zeros((m,), jnp.float32),
        sy=jnp.zeros((m, m), jnp.float32),
        yy=jnp.zeros((m, m), jnp.float32),
        sg=jnp.zeros((m,), jnp.float32),
        yg=jnp.zeros((m,), jnp.float32),
        head=jnp.zeros((), jnp.int32),
        count=jnp.zeros((), jnp.int32),
        k=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), jnp.bool_),
    )

    def step(state: LBFGSState, _):
        d = _direction(state, m)

        # Step size: first iteration scales by min(1, 1/||g||_1) (torch rule).
        t = jnp.where(
            state.k == 0,
            jnp.minimum(1.0, 1.0 / jnp.maximum(jnp.sum(jnp.abs(state.g)), 1e-38)) * lr,
            jnp.asarray(lr, jnp.float32),
        )

        gtd = jnp.vdot(state.g, d, precision=_PREC)
        # torch breaks before stepping on a non-descent direction.
        bad_dir = gtd > -tolerance_change

        # Freezing on convergence is realized by zeroing the step: x stays
        # put, y ≈ 0 so no history row is stored, and the loss re-evaluates
        # to the same value. Every buffer update below is an in-place
        # single-row dynamic-update-slice inside the scan (no whole-history
        # selects, which would copy ~2·m·n floats per iteration).
        t_eff = jnp.where(state.done | bad_dir, 0.0, t)
        s_vec = t_eff * d
        x_new = state.x + s_vec
        loss_new, g_new = value_and_grad(x_new)
        loss_new = loss_new.astype(jnp.float32)
        g_new = g_new.astype(jnp.float32)

        # Curvature pair from this step: s = t·d, y = Δg.
        y = g_new - state.g
        ys = jnp.vdot(y, s_vec, precision=_PREC)
        store = (ys > 1e-10) & ~state.done
        idx = state.head
        # Rows may be stored at reduced precision (history_dtype=bf16 halves
        # the optimizer's HBM traffic); ρ and the Gram caches are computed
        # from the STORED values so the direction math stays self-consistent.
        hd = state.hist.dtype
        s_row = jnp.where(store, s_vec.astype(hd), state.hist[idx])
        y_row = jnp.where(store, y.astype(hd), state.hist[m + idx])
        hist = state.hist.at[idx].set(s_row).at[m + idx].set(y_row)
        rho = state.rho.at[idx].set(
            jnp.where(store, 1.0 / jnp.where(store, ys, 1.0), state.rho[idx]))

        # ONE full-history pass yields every update quantity at once:
        #   H·[s y g] → (S·s, S·y, S·g | Y·s, Y·y, Y·g) against the POST-
        # update rows. S·g/Y·g refill the caches for the next direction;
        # the s/y columns are the new Gram row+column at slot ``idx``.
        rhs = jnp.stack([s_row, y_row, g_new.astype(hd)], axis=1)
        prods = jnp.matmul(hist, rhs, precision=_PREC).astype(jnp.float32)
        Sy_, sg_new = prods[:m, 1], prods[:m, 2]   # (S·s is a free byproduct)
        Ys_, Yy_, yg_new = prods[m:, 0], prods[m:, 1], prods[m:, 2]

        # sy[i, j] = s_iᵀ y_j:  row idx ← s_newᵀ y_j = (Y·s_new)_j;
        #                       col idx ← s_iᵀ y_new = (S·y_new)_i.
        sy = state.sy.at[idx, :].set(jnp.where(store, Ys_, state.sy[idx, :]))
        sy = sy.at[:, idx].set(jnp.where(store, Sy_, sy[:, idx]))
        yy = state.yy.at[idx, :].set(jnp.where(store, Yy_, state.yy[idx, :]))
        yy = yy.at[:, idx].set(jnp.where(store, Yy_, yy[:, idx]))

        head = jnp.where(store, jnp.mod(state.head + 1, m), state.head)
        count = jnp.where(store, jnp.minimum(state.count + 1, m), state.count)

        # Convergence latches (torch tolerances).
        small_grad = jnp.max(jnp.abs(g_new)) <= tolerance_grad
        small_step = jnp.max(jnp.abs(s_vec)) <= tolerance_change
        small_dloss = jnp.abs(loss_new - state.loss) < tolerance_change
        done = state.done | bad_dir | small_grad | small_step | small_dloss

        new_state = LBFGSState(
            x=x_new, g=g_new, loss=loss_new,
            hist=hist, rho=rho, sy=sy, yy=yy, sg=sg_new, yg=yg_new,
            head=head, count=count, k=state.k + 1, done=done,
        )
        return new_state, loss_new

    final, losses = lax.scan(step, init, None, length=max_iters)
    return unravel(final.x), final.loss, losses


def lbfgs_minimize_jit(loss_fn, x0, max_iters, **kw):
    """Convenience: jit-compiled end-to-end L-BFGS run."""
    fn = jax.jit(
        functools.partial(lbfgs_minimize, loss_fn, max_iters=max_iters, **kw)
    )
    return fn(x0)
