"""Device-side Hungarian (linear assignment) matching.

The reference ships the cost matrix to the host and calls scipy's
``linear_sum_assignment`` once per (sample x decoder layer)
(`hungarian_assigner_3d.py:126-135` in sty61010/PETR) — a device->host sync in
the middle of every training step. Here the LAP is solved **on device** with a
Jonker-Volgenant shortest-augmenting-path algorithm expressed in
``lax.fori_loop`` / ``lax.while_loop`` so it jits, vmaps over the batch, and
never leaves the TPU.

Shapes are static: GT boxes are padded to ``max_gt`` rows; padded rows carry a
constant cost, which provably leaves the optimum over real rows unchanged
(padded rows are indifferent between the leftover columns).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_INF = 1e9


def lap_solve(cost: jax.Array, row_valid: jax.Array) -> jax.Array:
    """Solve min-cost assignment of rows -> distinct columns.

    Args:
        cost: (R, C) fp32 cost, R <= C. Rows where ``row_valid`` is False are
            padding (their cost content is ignored; a constant row is used).
        row_valid: (R,) bool.

    Returns:
        col_of_row: (R,) int32 — the column assigned to each valid row.
        Invalid rows return an arbitrary column (0); consumers MUST mask
        with ``row_valid`` (e.g. scatter via a dump slot) — invalid rows'
        values may collide with valid assignments.
    """
    R, C = cost.shape
    assert R <= C, "lap_solve expects rows <= cols"
    cost = jnp.nan_to_num(cost.astype(jnp.float32), nan=100.0, posinf=100.0, neginf=-100.0)
    # Padded rows: constant cost -> optimum over valid rows is preserved.
    cost = jnp.where(row_valid[:, None], cost, 0.0)

    VIRT = C  # virtual start column index

    # --- Row-reduction warm start (the rectangular-safe initialization
    # phase of the Jonker-Volgenant algorithm, vectorized) ---------------
    # u_i = min_j cost[i, j]; match each valid row to its argmin column
    # unless another (lower-index) row claims the same column. This keeps
    # the successive-shortest-path loop below EXACT: duals stay feasible
    # (cost[i,j] - u_i - v_j >= 0 with v = 0), every warm-start pair is
    # tight (cost[i,j*] = u_i), and v = 0 preserves the rectangular-dual
    # requirement that UNUSED columns have v_j <= 0 (which is why a
    # column-reduction start — v_j = column minima — would be wrong here:
    # an unmatched column with negative v violates complementary
    # slackness and yields suboptimal assignments). With R << C argmin
    # collisions are rare, so most rows skip their augmenting search
    # entirely; under the (layers x batch) vmap those searches run in
    # lock step, so the sequential iteration count — the set loss's real
    # cost on TPU, ROOFLINE.md §6 — drops by the fraction of rows
    # assigned here.
    row_min = cost.min(axis=1)  # (R,)
    j_star = jnp.argmin(cost, axis=1).astype(jnp.int32)  # (R,)
    row_ids = jnp.arange(R, dtype=jnp.int32)
    # contested columns: lowest row index wins (R = "none" sentinel)
    claim = jnp.where(row_valid, j_star, C)
    r_of_col = jnp.full((C + 1,), R, jnp.int32).at[claim].min(row_ids)
    pre = row_valid & (r_of_col[claim] == row_ids)  # (R,)

    # Compact the rows that still need an augmenting search into a dense
    # prefix, and drive them with a `while k < n_free` loop instead of a
    # fori over all R rows. This is THE lever under vmap: per-lane
    # warm-start misses land on DIFFERENT rows in different lanes, so a
    # row-indexed fori still executes ~every row in lock step (any lane
    # augmenting at row i stalls all lanes there — measured 308 ms on the
    # L6 x B4 flagship shape, no better than no warm start); a compacted
    # free-row loop runs max-over-lanes(n_free) iterations (~10% of R).
    # Successive-shortest-path augmentation is order-independent, so
    # processing free rows in sorted order preserves exact optimality.
    free_sorted = jnp.sort(jnp.where((~pre) & row_valid, row_ids, R))  # (R,)
    n_free = jnp.sum((~pre) & row_valid)

    def assign_row(k, carry):
        u, v, p = carry  # u:(R+1,), v:(C+1,), p:(C+1,) col->row, -1 = free
        # Lanes whose free rows are exhausted (k >= n_free under a vmapped
        # peer's longer loop) set p[VIRT] = -1, which makes both
        # while_loops below exit immediately, so u/v/p are untouched.
        live = k < n_free
        i = jnp.minimum(free_sorted[k], R - 1)  # clamp the R sentinel
        p = p.at[VIRT].set(jnp.where(live, i, -1))
        minv0 = jnp.full((C,), _INF, jnp.float32)
        way0 = jnp.full((C,), VIRT, jnp.int32)
        used0 = jnp.zeros((C + 1,), jnp.bool_)

        def cond(s):
            j0, _, _, _, u, v, p = s
            return p[j0] != -1

        def body(s):
            j0, minv, way, used, u, v, p = s
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = cost[i0] - u[i0] - v[:C]
            better = (cur < minv) & ~used[:C]
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(used[:C], _INF, minv)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            # potentials: u[p[j]] += delta for used j; v[j] -= delta for used j
            bump_idx = jnp.where(used, p, R)  # R = dump slot in u
            u = u.at[bump_idx].add(delta)
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used[:C], minv, minv - delta)
            return j1, minv, way, used, u, v, p

        j0, _, way, _, u, v, p = jax.lax.while_loop(
            cond, body, (jnp.int32(VIRT), minv0, way0, used0, u, v, p)
        )

        # Augment along the alternating path back to the virtual column.
        def aug_cond(s):
            j0, _ = s
            return j0 != VIRT

        def aug_body(s):
            j0, p = s
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return j1, p

        _, p = jax.lax.while_loop(aug_cond, aug_body, (j0, p))
        return k + 1, (u, v, p)

    # u_i = row minimum for every valid row (rows that still augment start
    # their Dijkstra from the same tight reduced costs)
    u0 = jnp.concatenate(
        [jnp.where(row_valid, row_min, 0.0), jnp.zeros((1,), jnp.float32)]
    )
    v0 = jnp.zeros((C + 1,), jnp.float32)
    p0 = jnp.full((C + 1,), -1, jnp.int32)
    # seed the warm-start matching: p[j_star[i]] = i for pre-assigned rows
    p0 = p0.at[jnp.where(pre, j_star, C)].set(
        jnp.where(pre, row_ids, -1)
    ).at[VIRT].set(-1)
    _, (_, _, p) = jax.lax.while_loop(
        lambda s: s[0] < n_free,
        lambda s: assign_row(s[0], s[1]),
        (jnp.int32(0), (u0, v0, p0)),
    )

    # Invert col->row into row->col.
    col_ids = jnp.arange(C, dtype=jnp.int32)
    rows = p[:C]
    col_of_row = jnp.zeros((R,), jnp.int32).at[jnp.where(rows >= 0, rows, R - 1)].max(
        jnp.where(rows >= 0, col_ids, 0)
    )
    # The scatter-max above is safe because each assigned row appears exactly
    # once among the columns; unassigned rows (impossible when R<=C after full
    # run) would read 0.
    return col_of_row


def hungarian_match(
    cost: jax.Array,
    gt_valid: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Match queries to (padded) GT boxes by min-cost assignment.

    Args:
        cost: (Q, G) fp32 cost between Q query predictions and G padded GTs.
        gt_valid: (G,) bool — True for real GT rows.

    Returns:
        query_of_gt: (G,) int32, the query index matched to each GT row.
        match_valid: (G,) bool, alias of gt_valid (a real GT is always
            matched when G <= Q).
    """
    # Solve with GTs as rows (G <= Q): each GT gets a distinct query.
    q_of_g = lap_solve(cost.T, gt_valid)
    return q_of_g, gt_valid
