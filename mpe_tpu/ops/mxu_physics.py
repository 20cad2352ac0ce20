"""MXU-packed pair physics for the fused kernels.

``generic_physics_block`` (ops/kernel_scenarios.py) unrolls collision
pairs as independent [1, N] / [P, N] row ops. On TPU those rows occupy
1-2 of a vreg's 8 sublanes, so the VPU runs pair math at 12-25%
utilization and every pair pays its own rsqrt/exp/log1p transcendental
(world_comm: 21 pairs -> 63 transcendental ops per step; measured
physics = 61% of the kernel, PERF.md).

This module reformulates the same math (core.py:117-169 semantics,
identical per-element arithmetic) as dense linear algebra the MXU can
run:

  pos_flat [E*P, N]                   entity-major row layout
  delta    = D @ pos_flat             D [2K, E*P] has +-1 entries: one
                                      matmul gathers ALL K pair deltas
                                      (x rows then y rows — no strided
                                      slicing)
  d2, pen, scale                      [K, N] sublane-PACKED pair math:
                                      ONE rsqrt + ONE logaddexp for all
                                      pairs
  force    = S @ (scale * delta)      S [E*P, 2K] scatters +-pair forces
                                      to movable entity rows
  integrate                           packed [E*P, N] damping + force +
                                      per-agent speed clamp via tiny
                                      select matmuls

D and S are built INSIDE the kernel from ``broadcasted_iota`` +
scalar-constant ``where`` chains (Mosaic kernels cannot capture array
constants; building them costs a few hundred tiny vector ops ONCE per
grid step, amortized over the whole rollout). The +-1 matmuls use
``Precision.HIGHEST`` so every product is exact in f32 and the result
matches the unrolled form to accumulation-order rounding (pairs touching
an entity sum in a different order).

Parity: pinned to the vmapped physics by tests/test_fused.py (interpret
f64) and value-checked on hardware by tools/tpu_parity.py.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def collide_pairs(spec):
    """(i, j) entity pairs that exert contact forces (core.py:151-169:
    both collide, at least one movable)."""
    return [
        (i, j)
        for i in range(spec.n_entities)
        for j in range(i + 1, spec.n_entities)
        if spec.collide[i] and spec.collide[j]
        and (spec.movable[i] or spec.movable[j])
    ]


def const_col(vals, dtype):
    """[len(vals), 1] column of scalar constants, built without an array
    constant (iota + where chain; consecutive equal values share one
    where)."""
    r = len(vals)
    io = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    out = jnp.full((r, 1), float(vals[0]), dtype)
    k = 1
    while k < r:
        k2 = k
        while k2 + 1 < r and vals[k2 + 1] == vals[k]:
            k2 += 1
        out = jnp.where((io >= k) & (io <= k2), float(vals[k]), out)
        k = k2 + 1
    return out


def entries_matrix(rows, n_rows, n_cols, dtype):
    """[n_rows, n_cols] from sparse row entries ``rows[r] = {c: v}``,
    built from 2-D iotas (no array constants in Mosaic kernels)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (n_rows, n_cols), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (n_rows, n_cols), 1)
    cell = ri * n_cols + ci
    out = jnp.zeros((n_rows, n_cols), dtype)
    for r, entries in enumerate(rows):
        for c, v in entries.items():
            out = jnp.where(cell == r * n_cols + c, float(v), out)
    return out


def mxu_physics_prep(spec, dtype, min_pairs: int = 4):
    """Loop-invariant constants for ``mxu_physics_block``: the ±1
    gather/scatter matrices and per-row constant columns. Build this
    ONCE before the kernel's step loop — Mosaic does NOT hoist the
    iota/where construction chains out of ``fori_loop`` (measured:
    rebuilding per step costs world_comm ~30% of its whole step), so
    the kernels call this via ``KernelScenario.prepare`` and thread the
    result through. Returns None when the scenario falls back to the
    unrolled physics."""
    pairs = collide_pairs(spec)
    if len(pairs) < max(1, min_pairs):
        return None
    a, e, p = spec.n_agents, spec.n_entities, spec.dim_p
    kp = len(pairs)
    ep = e * p

    d_rows = [{p * i + d: 1.0, p * j + d: -1.0}
              for d in range(p) for (i, j) in pairs]
    prep = {
        "D": entries_matrix(d_rows, p * kp, ep, dtype),
        "dmin": const_col([spec.size[i] + spec.size[j]
                           for i, j in pairs], dtype),
        "inv_mass_dt": const_col(
            [float(spec.dt) / float(spec.initial_mass[i // p])
             if spec.movable[i // p] else 0.0 for i in range(ep)], dtype),
        # non-movable rows are integration no-ops in core.py:158-169:
        # damping factor 1 and dt 0 keep their vel/pos bit-identical to
        # the unrolled path even if a caller hands in nonzero velocity
        "damp": const_col(
            [1.0 - float(spec.damping) if spec.movable[i // p] else 1.0
             for i in range(ep)], dtype),
        "dt": const_col(
            [float(spec.dt) if spec.movable[i // p] else 0.0
             for i in range(ep)], dtype),
    }
    s_rows = [dict() for _ in range(ep)]
    for kidx, (i, j) in enumerate(pairs):
        for d in range(p):
            if spec.movable[i]:
                s_rows[p * i + d][d * kp + kidx] = 1.0
            if spec.movable[j]:
                s_rows[p * j + d][d * kp + kidx] = -1.0
    prep["S"] = entries_matrix(s_rows, ep, p * kp, dtype)

    clamp_ids = [i for i in range(e)
                 if spec.movable[i] and np.isfinite(spec.max_speed[i])]
    if clamp_ids:
        c = len(clamp_ids)
        sel_rows = [{p * i + d: 1.0 for d in range(p)} for i in clamp_ids]
        prep["Sel"] = entries_matrix(sel_rows, c, ep, dtype)
        prep["ms"] = const_col([spec.max_speed[i] for i in clamp_ids],
                               dtype)
        exp_rows = []
        for i in range(e):
            for d in range(p):
                exp_rows.append({clamp_ids.index(i): 1.0}
                                if i in clamp_ids else {})
        prep["Expand"] = entries_matrix(exp_rows, ep, c, dtype)
    return prep


def mxu_physics_block(spec, pos, vel, move, min_pairs: int = 4,
                      prep=None):
    """Drop-in for ``generic_physics_block``: pos/vel [E, P, N], move
    [A, 5, N] -> (pos, vel). Falls back to the unrolled form when there
    are too few pairs for packing to pay. Pass ``prep`` from
    ``mxu_physics_prep`` (built before the step loop) to avoid
    reconstructing the constant matrices every iteration."""
    from mpe_tpu.ops.kernel_scenarios import (
        decode_move_block, generic_physics_block)

    pairs = collide_pairs(spec)
    if len(pairs) < max(1, min_pairs):
        return generic_physics_block(spec, pos, vel, move)

    a, e, p = spec.n_agents, spec.n_entities, spec.dim_p
    kp = len(pairs)
    ep = e * p
    dtype = pos.dtype
    n = pos.shape[-1]
    k_margin = float(spec.contact_margin)
    cf = float(spec.contact_force)
    if prep is None:
        prep = mxu_physics_prep(spec, dtype, min_pairs)

    u = decode_move_block(spec, move)                       # [A, P, N]
    pos_flat = jnp.concatenate([pos[i] for i in range(e)], axis=0)
    vel_flat = jnp.concatenate([vel[i] for i in range(e)], axis=0)

    # pair deltas: rows 0..K-1 = dim 0, rows K..2K-1 = dim 1, ...
    D = prep["D"]
    delta = jnp.dot(D, pos_flat, precision=_HI)             # [p*K, N]

    d2 = jnp.zeros((kp, n), dtype)
    for d in range(p):
        d2 = d2 + jnp.square(delta[d * kp : (d + 1) * kp])
    inv = jax.lax.rsqrt(jnp.maximum(d2, float(jnp.finfo(dtype).tiny)))
    dist = d2 * inv
    pen = jnp.logaddexp(jnp.zeros((), dtype),
                        -(dist - prep["dmin"]) / k_margin) * k_margin
    scale = (cf * pen) * inv                                # [K, N]
    f = jnp.concatenate(
        [scale * delta[d * kp : (d + 1) * kp] for d in range(p)], axis=0)

    # scatter +-pair forces to movable entity rows
    force = jnp.dot(prep["S"], f, precision=_HI)            # [E*p, N]

    # action forces (decode already zeroes non-movable agents)
    u_flat = jnp.concatenate(
        [u[i] for i in range(a)]
        + ([jnp.zeros(((e - a) * p, n), dtype)] if e > a else []), axis=0)

    # packed integration: damping-before-force (core.py:129-140), then
    # per-agent speed clamp, then position. Non-movable rows are exact
    # no-ops: per-row damping 1 / dt 0 / force scale 0 (prep columns)
    v = vel_flat * prep["damp"] + (force + u_flat) * prep["inv_mass_dt"]

    if "Sel" in prep:
        s2 = jnp.dot(prep["Sel"], jnp.square(v), precision=_HI)  # [C, N]
        ms = prep["ms"]
        inv_s = jax.lax.rsqrt(jnp.maximum(s2, float(jnp.finfo(dtype).tiny)))
        factor = jnp.where(s2 > ms * ms, ms * inv_s,
                           jnp.ones((), dtype))             # [C, N]
        # expand factor back to entity rows: rows outside clamp groups
        # keep factor 1 (Expand row is zero there -> 1 + 0)
        v = v * (1.0 + jnp.dot(prep["Expand"], factor - 1.0,
                               precision=_HI))

    pos_new = pos_flat + v * prep["dt"]
    return (jnp.stack([pos_new[p * i : p * (i + 1)] for i in range(e)]),
            jnp.stack([v[p * i : p * (i + 1)] for i in range(e)]))
