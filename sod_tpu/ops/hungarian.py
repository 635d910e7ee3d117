"""Exact Hungarian (linear sum assignment) inside jit.

The reference criterion calls ``scipy.optimize.linear_sum_assignment`` on a
(M x Q) dice-minus-objectness cost matrix per image per decoder layer
(criterion pyc offsets 1696-1810), forcing a GPU->CPU sync in the hot loop.
Here the solver runs on-device: the classic Jonker-Volgenant shortest
augmenting path algorithm expressed with ``lax.while_loop`` / ``lax.scan``
over static bounds (M, Q are tiny: M <= ~8 GT masks, Q = 20 queries), so a
whole batch x layers of assignments is one fused XLA computation under vmap.

Exactness is tested against scipy on random matrices
(tests/test_hungarian.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e30)


def hungarian(cost: jax.Array) -> jax.Array:
    """Minimum-cost assignment of rows to columns.

    :param cost: [M, Q] float matrix, M <= Q.
    :return: col4row [M] int32 — the column assigned to each row (row order
        is arange(M), matching scipy's ``linear_sum_assignment``).
    """
    M, Q = cost.shape
    if M > Q:
        raise ValueError(f"hungarian requires M <= Q, got {cost.shape}")
    cost = cost.astype(jnp.float32)

    # 1-based rows (0 = none); column index 0 is the virtual start column.
    u0 = jnp.zeros(M + 1, jnp.float32)         # row potentials
    v0 = jnp.zeros(Q + 1, jnp.float32)         # column potentials
    p0 = jnp.zeros(Q + 1, jnp.int32)           # p[j] = row matched to col j

    c = jnp.pad(cost, ((1, 0), (1, 0)))        # [(M+1), (Q+1)], row/col 0 virtual
    col_ids = jnp.arange(Q + 1)

    def assign_row(carry, i):
        u, v, p = carry
        i = i + 1                              # 1-based row index

        minv = jnp.full(Q + 1, _INF)
        used = jnp.zeros(Q + 1, bool)
        way = jnp.zeros(Q + 1, jnp.int32)
        p = p.at[0].set(i)
        j0 = jnp.int32(0)

        def path_cond(s):
            _, _, p, _, _, _, j0 = s
            return p[j0] != 0

        def path_body(s):
            u, v, p, minv, used, way, j0 = s
            used = used.at[j0].set(True)
            i0 = p[j0]
            # relax edges from row i0 to all unused real columns
            cur = c[i0] - u[i0] - v
            cur = jnp.where(used | (col_ids == 0), _INF, cur)
            better = cur < minv
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)

            masked = jnp.where(used, _INF, minv)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]

            # u[p[j]] += delta and v[j] -= delta for used j; else minv -= delta
            u = u.at[p].add(jnp.where(used, delta, 0.0))
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used, minv, minv - delta)
            return (u, v, p, minv, used, way, j1)

        u, v, p, minv, used, way, j0 = jax.lax.while_loop(
            path_cond, path_body, (u, v, p, minv, used, way, j0))

        # augment along the alternating path back to the virtual column
        def aug_cond(s):
            _, j0 = s
            return j0 != 0

        def aug_body(s):
            p, j0 = s
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return (p, j1)

        p, _ = jax.lax.while_loop(aug_cond, aug_body, (p, j0))
        return (u, v, p), None

    (_, _, p), _ = jax.lax.scan(assign_row, (u0, v0, p0), jnp.arange(M))

    # invert: col4row[r] = j-1 where p[j] == r+1
    rows = p[1:]                               # matched row (1-based) per column
    # unmatched columns carry row 0 -> route them to a dropped slot (index M;
    # negative indices would wrap in JAX scatters)
    idx = jnp.where(rows >= 1, rows - 1, M)
    col4row = jnp.full(M, -1, jnp.int32)
    col4row = col4row.at[idx].set(jnp.arange(Q, dtype=jnp.int32), mode="drop")
    return col4row


def assignment_cost(cost: jax.Array, col4row: jax.Array) -> jax.Array:
    """Total cost of an assignment."""
    return jnp.sum(jnp.take_along_axis(cost, col4row[:, None], axis=1))
