"""Fused PPO update: the clipped-surrogate gradient in ONE Pallas
kernel — forward MLP, loss backward, and weight-gradient accumulation
without activations ever touching HBM.

Why: the PPO update dominates end-to-end training time (PERF.md). The
XLA epoch materializes both hidden layers to HBM ([T, A, H, N] f32 is
~200 MB each at the bench config) for the backward pass — measured ~3x
above the HBM roofline. This kernel streams the batch through VMEM
tiles instead: per grid step it loads an (obs, actions, logp_old, adv,
ret, v_old) chunk, runs forward on the MXU (agents lane-concatenated,
one matmul per layer — same shape as ops/fused_policy), computes the
clipped-surrogate/value/entropy gradient at the logits analytically,
backpropagates through the two tanh layers, and accumulates weight
gradients in revisited output blocks (the TPU grid is sequential, so
``+=`` into a constant-index output block is race-free). HBM traffic
per epoch = the batch read once + O(params) out.

The gradient is hand-derived (Pallas has no autodiff) and pinned to
``jax.grad`` of the identical XLA loss by tests/test_fused_update.py:

  d pg / d logits   = -(adv * ratio) * [r*adv <= clip(r)*adv] * (oh - p) / B
  d (-ent_coef H)   =  ent_coef * p * (ls + H) / B
  d vf vloss / d v  =  vf_coef * 2 (v - ret) * [(v-ret)^2 >= (vc-ret)^2] / B

(the indicator forms match jax's min/max adjoints everywhere except
measure-zero ties; comm factors are masked per-agent for silent agents
exactly as learner.fused_ppo._factored_logp_ent).

Matmuls run in ``compute_dtype`` (bf16 on TPU) with f32 accumulation
via ``preferred_element_type`` — the same contract as the XLA path in
learner/fused_ppo.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32

# Zero-pad rows for single-row value heads: Mosaic lowers M=1 / K=1
# matmuls through a reduced-precision path (~1e-2 rel error; M,K>=2
# are bit-exact vs XLA — measured by tools/tpu_train_parity.py probes)
VPAD = 8


def _acc_dtype(cd):
    """Accumulation dtype: f32, widened to f64 for exactness tests."""
    return jnp.float64 if cd == jnp.float64 else f32


def _dot(a, b, cd):
    """[M, K] @ [K, N] with compute dtype ``cd``, f32 accumulation."""
    return jnp.dot(a.astype(cd), b.astype(cd),
                   preferred_element_type=_acc_dtype(cd))


def _dot_nt(a, b, cd):
    """a [K, M], b [H, M] -> a @ b.T [K, H] (contraction over lanes)."""
    return jax.lax.dot_general(
        a.astype(cd), b.astype(cd), (((1,), (1,)), ((), ())),
        preferred_element_type=_acc_dtype(cd))


def _softmax_rows(z):
    """Softmax over axis 0 of [K, M]: (p, logp, entropy [1, M])."""
    m = jnp.max(z, axis=0, keepdims=True)
    e = jnp.exp(z - m)
    s = jnp.sum(e, axis=0, keepdims=True)
    ls = (z - m) - jnp.log(s)
    p = e / s
    ent = -jnp.sum(p * ls, axis=0, keepdims=True)
    return p, ls, ent


# ---- shared kernel pieces (identical math in the PPO and MAPPO update
# kernels; factored so a fix to the hand-derived forms lands in both) --


def _cat_lanes(ref, t, a):
    """Block ref [t_chunk, A, R, nb] -> [R, A*nb]. Each agent's tile is
    loaded straight from the ref: slicing an already-loaded [A, nb]
    vector leaves the rows at sublane offsets 1..A-1, and Mosaic refuses
    to lane-concat vectors with mismatched sublane offsets — fresh loads
    all sit at offset 0."""
    return jnp.concatenate([ref[t, i] for i in range(a)], axis=-1)


def _cat_rows(ref, t, a):                   # [t_chunk, A, nb] -> [1, A*nb]
    return jnp.concatenate([ref[t, i : i + 1] for i in range(a)], axis=-1)


def _speak_mask(spec, nb, at):
    """[1, A*nb] lane-concatenated per-agent speak mask (silent agents
    contribute no comm factor)."""
    return jnp.concatenate(
        [jnp.full((1, nb), 0.0 if spec.silent[i] else 1.0, at)
         for i in range(spec.n_agents)], axis=1)


def _policy_logit_grad(z, mvoh, cmoh, lpo, adv, speak, *, mw, dim_c,
                       clip, ent_coef, inv_b, at):
    """Clipped-surrogate + entropy gradient at the policy logits
    ``z`` [K, M] (factored move/comm heads):

      d pg / d logits = -(adv*ratio) * [r*adv <= clip(r)*adv] * (oh-p)/B
      d (-ent_coef H) =  ent_coef * p * (ls + H) / B

    Returns (g [K, M], ent [1, M], s1, s2) where s1/s2 are the
    surrogate terms for the metric sums."""
    p, ls, ent_m = _softmax_rows(z[:mw])
    lp = jnp.sum(ls * mvoh, axis=0, keepdims=True)
    ent = ent_m
    if dim_c:
        pc, lsc, ent_c = _softmax_rows(z[mw : mw + dim_c])
        lp = lp + jnp.sum(lsc * cmoh, axis=0, keepdims=True) * speak
        ent = ent_m + ent_c * speak

    ratio = jnp.exp(lp - lpo)
    rc = jnp.clip(ratio, 1.0 - clip, 1.0 + clip)
    s1 = ratio * adv
    s2 = rc * adv
    unclipped = (s1 <= s2).astype(at)
    cpg = -(adv * ratio) * unclipped * inv_b

    # entropy grads use each HEAD's own entropy (the factors are
    # independent: dH_total/dz_move = dH_move/dz_move)
    gpi = cpg * (mvoh - p) + (ent_coef * inv_b) * p * (ls + ent_m)
    parts = [gpi]
    if dim_c:
        parts.append((cpg * (cmoh - pc)
                      + (ent_coef * inv_b) * pc * (lsc + ent_c)) * speak)
    g = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    return g, ent, s1, s2


def _value_clip_grad(v, vold, ret, *, clip, vf_coef, inv, at):
    """PPO-style clipped value loss gradient at the value output:
    d vf vloss / d v = vf_coef * 2 (v-ret) * [(v-ret)^2 >= (vc-ret)^2]/B.
    Returns (gv, vl_terms) with vl_terms the per-element loss for the
    metric sum."""
    vc = vold + jnp.clip(v - vold, -clip, clip)
    dv_live = (jnp.square(v - ret) >= jnp.square(vc - ret)).astype(at)
    gv = (vf_coef * 2.0 * inv) * (v - ret) * dv_live
    vl_terms = jnp.maximum(jnp.square(v - ret), jnp.square(vc - ret))
    return gv, vl_terms


def _mlp_backprop_acc(acc, base, x, h1, h2, g3, w2t, w3t, cd):
    """Backprop ``g3`` through the two tanh layers and accumulate the
    six weight/bias gradients into ``acc[base:base+6]``."""
    gh2 = _dot(w3t[:], g3, cd) * (1.0 - jnp.square(h2))
    gh1 = _dot(w2t[:], gh2, cd) * (1.0 - jnp.square(h1))
    acc[base + 0] = acc[base + 0] + _dot_nt(gh1, x, cd)
    acc[base + 1] = acc[base + 1] + jnp.sum(gh1, axis=1, keepdims=True)
    acc[base + 2] = acc[base + 2] + _dot_nt(gh2, h1, cd)
    acc[base + 3] = acc[base + 3] + jnp.sum(gh2, axis=1, keepdims=True)
    acc[base + 4] = acc[base + 4] + _dot_nt(g3, h2, cd)
    acc[base + 5] = acc[base + 5] + jnp.sum(g3, axis=1, keepdims=True)


def _metric_sums(s1, s2, vl_terms, ent, at):
    """[4, 1] column of (pg, vloss, entropy, 0) sums for this tile."""
    pg_s = jnp.sum(-jnp.minimum(s1, s2), axis=1, keepdims=True)
    vl_s = jnp.sum(vl_terms, axis=1, keepdims=True)
    ent_s = jnp.sum(ent, axis=1, keepdims=True)
    return jnp.concatenate([pg_s, vl_s, ent_s, jnp.zeros((1, 1), at)],
                           axis=0)


def _whole_spec(shape):
    return pl.BlockSpec(shape, lambda i, j: tuple([0] * len(shape)),
                        memory_space=pltpu.VMEM)


def _batch_spec(t_chunk, block_envs, *row):  # [T, ..., N] chunked blocks
    nd = len(row)
    return pl.BlockSpec(
        (t_chunk, *row, block_envs),
        lambda i, j, nd=nd: (j, *([0] * nd), i),
        memory_space=pltpu.VMEM)


def _update_kernel(
    obs_ref, mvoh_ref, cmoh_ref, lpo_ref, adv_ref, ret_ref, vold_ref,
    w1, b1, w2, b2, w3, b3, w2t, w3t,
    dw1, db1, dw2, db2, dw3, db3, msum,
    *, spec, uses_comm: bool, t_chunk: int, block_envs: int,
    clip: float, vf_coef: float, ent_coef: float, inv_b: float, cd,
):
    a = spec.n_agents
    mw = 2 * spec.dim_p + 1
    dim_c = spec.dim_c if uses_comm else 0
    ko = mw + dim_c + 1
    nb = block_envs
    m = a * nb

    at = _acc_dtype(cd)
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _zero():
        for ref in (dw1, db1, dw2, db2, dw3, db3, msum):
            ref[:] = jnp.zeros_like(ref)

    speak = _speak_mask(spec, nb, at) if dim_c else None

    acc = [jnp.zeros_like(dw1[:]), jnp.zeros_like(db1[:]),
           jnp.zeros_like(dw2[:]), jnp.zeros_like(db2[:]),
           jnp.zeros_like(dw3[:]), jnp.zeros_like(db3[:]),
           jnp.zeros_like(msum[:])]

    for t in range(t_chunk):
        x = _cat_lanes(obs_ref, t, a)       # [OW, A*nb]
        mvoh = _cat_lanes(mvoh_ref, t, a)   # [mw, A*nb]
        cmoh = _cat_lanes(cmoh_ref, t, a) if dim_c else None
        lpo = _cat_rows(lpo_ref, t, a)      # [1, A*nb]
        adv = _cat_rows(adv_ref, t, a)
        ret = _cat_rows(ret_ref, t, a)
        vold = _cat_rows(vold_ref, t, a)

        h1 = jnp.tanh(_dot(w1[:], x, cd) + b1[:])
        h2 = jnp.tanh(_dot(w2[:], h1, cd) + b2[:])
        z = _dot(w3[:], h2, cd) + b3[:]     # [KO, A*nb]
        v = z[ko - 1 : ko]                  # [1, A*nb]

        gp, ent, s1, s2 = _policy_logit_grad(
            z, mvoh, cmoh, lpo, adv, speak, mw=mw, dim_c=dim_c,
            clip=clip, ent_coef=ent_coef, inv_b=inv_b, at=at)
        gv, vl_terms = _value_clip_grad(
            v, vold, ret, clip=clip, vf_coef=vf_coef, inv=inv_b, at=at)
        g3 = jnp.concatenate([gp, gv], axis=0)       # [KO, A*nb]

        _mlp_backprop_acc(acc, 0, x, h1, h2, g3, w2t, w3t, cd)
        acc[6] = acc[6] + _metric_sums(s1, s2, vl_terms, ent, at)

    for ref, val in zip((dw1, db1, dw2, db2, dw3, db3, msum), acc):
        ref[:] = ref[:] + val


def _mappo_update_kernel(
    obs_ref, mvoh_ref, cmoh_ref, lpo_ref, adv_ref, ret_ref, vold_ref,
    w1a, b1a, w2a, b2a, w3a, b3a, w2at, w3at,
    w1c, b1c, w2c, b2c, w3c, b3c, w2ct, w3ct,
    dw1a, db1a, dw2a, db2a, dw3a, db3a,
    dw1c, db1c, dw2c, db2c, dw3c, db3c, msum,
    *, spec, uses_comm: bool, t_chunk: int, block_envs: int,
    clip: float, vf_coef: float, ent_coef: float,
    inv_b: float, inv_bv: float, cd,
):
    """MAPPO epoch gradient (learner.fused_ppo.build_fused_mappo_step's
    loss): decentralized actor (agents lane-concatenated, shared
    params) + centralized critic on the joint observation (agent obs
    sublane-concatenated). The team advantage ``adv`` [t_chunk, 1, nb]
    broadcasts across agents by lane-concat. Same analytic gradient
    forms as ``_update_kernel``; the critic's value loss is a mean over
    [T, N] (``inv_bv``) while pg/entropy are means over [T, A, N]
    (``inv_b``)."""
    a = spec.n_agents
    mw = 2 * spec.dim_p + 1
    dim_c = spec.dim_c if uses_comm else 0

    at = _acc_dtype(cd)
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    outs = (dw1a, db1a, dw2a, db2a, dw3a, db3a,
            dw1c, db1c, dw2c, db2c, dw3c, db3c, msum)

    @pl.when(first)
    def _zero():
        for ref in outs:
            ref[:] = jnp.zeros_like(ref)

    speak = _speak_mask(spec, block_envs, at) if dim_c else None

    acc = [jnp.zeros_like(r[:]) for r in outs]

    for t in range(t_chunk):
        x = _cat_lanes(obs_ref, t, a)       # [OW, A*nb]
        xj = jnp.concatenate([obs_ref[t, i] for i in range(a)],
                             axis=0)        # joint obs [A*OW, nb]
        mvoh = _cat_lanes(mvoh_ref, t, a)
        cmoh = _cat_lanes(cmoh_ref, t, a) if dim_c else None
        lpo = _cat_rows(lpo_ref, t, a)
        adv1 = adv_ref[t]                   # [1, nb] team adv
        adv = jnp.concatenate([adv1] * a, axis=-1)    # [1, A*nb]
        ret = ret_ref[t]                    # [1, nb]
        vold = vold_ref[t]

        # actor forward + pg/entropy gradient at its logits
        h1 = jnp.tanh(_dot(w1a[:], x, cd) + b1a[:])
        h2 = jnp.tanh(_dot(w2a[:], h1, cd) + b2a[:])
        z = _dot(w3a[:], h2, cd) + b3a[:]   # [K, A*nb]
        g3, ent, s1, s2 = _policy_logit_grad(
            z, mvoh, cmoh, lpo, adv, speak, mw=mw, dim_c=dim_c,
            clip=clip, ent_coef=ent_coef, inv_b=inv_b, at=at)
        _mlp_backprop_acc(acc, 0, x, h1, h2, g3, w2at, w3at, cd)

        # centralized critic forward + clipped value-loss gradient (its
        # mean is over [T, N] — inv_bv — vs the actor's [T, A, N]).
        # The value head is ZERO-PADDED to VPAD rows because Mosaic
        # computes M=1 / K=1 matmuls in reduced precision (~1e-2 rel,
        # measured in tools/tpu_train_parity.py; M,K>=2 are bit-exact
        # vs XLA) — the pad rows carry exact zeros through fwd and bwd
        g1 = jnp.tanh(_dot(w1c[:], xj, cd) + b1c[:])
        g2 = jnp.tanh(_dot(w2c[:], g1, cd) + b2c[:])
        v = (_dot(w3c[:], g2, cd) + b3c[:])[0:1]   # [VPAD, nb] -> [1, nb]
        gv, vl_terms = _value_clip_grad(
            v, vold, ret, clip=clip, vf_coef=vf_coef, inv=inv_bv, at=at)
        gv_pad = jnp.concatenate(
            [gv, jnp.zeros((VPAD - 1, block_envs), gv.dtype)], axis=0)
        _mlp_backprop_acc(acc, 6, xj, g1, g2, gv_pad, w2ct, w3ct, cd)

        acc[12] = acc[12] + _metric_sums(s1, s2, vl_terms, ent, at)

    for ref, val in zip(outs, acc):
        ref[:] = ref[:] + val


def fused_mappo_update(
    kscn,
    n_envs: int,
    n_steps: int,
    hidden: int,
    clip: float = 0.2,
    vf_coef: float = 0.5,
    ent_coef: float = 0.01,
    block_envs: int = 1024,
    t_chunk: int = 8,
    interpret: bool = False,
    compute_dtype=f32,
):
    """Build ``update(params, obs, mv_oh, cm_oh, logp_old, adv_n, ret,
    v_old) -> (grads, (pg, vloss, ent))`` for the MAPPO params of
    learner.ppo.init_mappo (a1/a2/pi actor + c1/c2/v centralized
    critic). ``adv_n``/``ret``/``v_old`` are the TEAM streams [T, N]
    (``adv_n`` pre-normalized); grads match ``jax.grad`` of
    learner.fused_ppo.build_fused_mappo_step's loss_fn."""
    from mpe_tpu.ops.fused_rollout import pick_block_envs
    from mpe_tpu.ops.kernel_scenarios import kernel_scenario, KernelScenario

    kscn = kscn if isinstance(kscn, KernelScenario) else kernel_scenario(kscn)
    spec = kscn.spec
    a = spec.n_agents
    mw = 2 * spec.dim_p + 1
    dim_c = spec.dim_c if kscn.uses_comm else 0
    k = mw + dim_c
    ow = kscn.obs_w
    h = hidden
    block_envs = pick_block_envs(n_envs, block_envs)
    assert n_steps % t_chunk == 0, (n_steps, t_chunk)
    n_blocks = n_envs // block_envs
    n_chunks = n_steps // t_chunk
    inv_b = 1.0 / float(n_steps * a * n_envs)
    inv_bv = 1.0 / float(n_steps * n_envs)

    kernel = functools.partial(
        _mappo_update_kernel, spec=spec, uses_comm=kscn.uses_comm,
        t_chunk=t_chunk, block_envs=block_envs, clip=clip,
        vf_coef=vf_coef, ent_coef=ent_coef, inv_b=inv_b, inv_bv=inv_bv,
        cd=compute_dtype)

    batch_spec = functools.partial(_batch_spec, t_chunk, block_envs)

    in_specs = [batch_spec(a, ow), batch_spec(a, mw)]
    in_specs.append(batch_spec(a, dim_c) if dim_c else batch_spec(a))
    in_specs.append(batch_spec(a))           # logp_old [T, A, N]
    in_specs += [batch_spec(1)] * 3          # adv, ret, vold [T, 1, N]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 16  # weights

    whole = _whole_spec
    out_specs = (whole((h, ow)), whole((h, 1)), whole((h, h)),
                 whole((h, 1)), whole((k, h)), whole((k, 1)),
                 whole((h, a * ow)), whole((h, 1)), whole((h, h)),
                 whole((h, 1)), whole((VPAD, h)), whole((VPAD, 1)),
                 whole((4, 1)))
    acc_t = _acc_dtype(compute_dtype)
    out_shapes = tuple(jax.ShapeDtypeStruct(s.block_shape, acc_t)
                       for s in out_specs)

    grid_spec = pl.GridSpec(grid=(n_blocks, n_chunks),
                            in_specs=tuple(in_specs),
                            out_specs=out_specs)
    call = pl.pallas_call(kernel, grid_spec=grid_spec,
                          out_shape=out_shapes, interpret=interpret)

    @jax.jit
    def update(params, obs, mv_oh, cm_oh, logp_old, adv_n, ret, v_old):
        wt = lambda q: params[q]["w"].T.astype(acc_t)
        bc = lambda q: params[q]["b"].astype(acc_t)[:, None]
        if cm_oh is None:
            cm_oh = jnp.zeros(mv_oh.shape[:2] + mv_oh.shape[3:], acc_t)
        team = lambda s: s[:, None, :]       # [T, N] -> [T, 1, N]
        w2a, w3a = wt("a2"), wt("pi")
        w2c = wt("c2")
        # value head zero-padded to VPAD rows (M=1 Mosaic precision)
        w3c = jnp.concatenate(
            [wt("v"), jnp.zeros((VPAD - 1, h), acc_t)], axis=0)
        b3c = jnp.concatenate(
            [bc("v"), jnp.zeros((VPAD - 1, 1), acc_t)], axis=0)
        (dw1a, db1a, dw2a, db2a, dw3a, db3a,
         dw1c, db1c, dw2c, db2c, dw3c, db3c, msum) = call(
            obs, mv_oh, cm_oh, logp_old, team(adv_n), team(ret),
            team(v_old),
            wt("a1"), bc("a1"), w2a, bc("a2"), w3a, bc("pi"),
            w2a.T, w3a.T,
            wt("c1"), bc("c1"), w2c, bc("c2"), w3c, b3c,
            w2c.T, w3c.T)
        grads = {
            "a1": {"w": dw1a.T, "b": db1a[:, 0]},
            "a2": {"w": dw2a.T, "b": db2a[:, 0]},
            "pi": {"w": dw3a.T, "b": db3a[:, 0]},
            "c1": {"w": dw1c.T, "b": db1c[:, 0]},
            "c2": {"w": dw2c.T, "b": db2c[:, 0]},
            "v": {"w": dw3c[0:1].T, "b": db3c[0:1, 0]},
        }
        pg = msum[0, 0] * inv_b
        vl = msum[1, 0] * inv_bv
        ent = msum[2, 0] * inv_b
        return grads, (pg, vl, ent)

    update.block_envs = block_envs
    return update


def fused_ppo_update(
    kscn,
    n_envs: int,
    n_steps: int,
    hidden: int,
    clip: float = 0.2,
    vf_coef: float = 0.5,
    ent_coef: float = 0.01,
    block_envs: int = 1024,
    t_chunk: int = 8,
    interpret: bool = False,
    compute_dtype=f32,
):
    """Build ``update(params, obs, mv_oh, cm_oh, logp_old, adv_n, ret,
    v_old) -> (grads, (pg, vloss, ent))`` for the shared-torso
    actor-critic of learner.ppo.init_ac. ``grads`` comes back in the
    same pytree layout as ``jax.grad`` of learner.fused_ppo's loss_fn
    (means over the local [T, A, N] batch; ``adv_n`` must already be
    normalized). Tensors are env-minor exactly as emitted by
    ops/fused_policy.fused_policy_trajectory."""
    from mpe_tpu.ops.fused_rollout import pick_block_envs
    from mpe_tpu.ops.kernel_scenarios import kernel_scenario, KernelScenario

    kscn = kscn if isinstance(kscn, KernelScenario) else kernel_scenario(kscn)
    spec = kscn.spec
    a = spec.n_agents
    mw = 2 * spec.dim_p + 1
    dim_c = spec.dim_c if kscn.uses_comm else 0
    ko = mw + dim_c + 1
    ow = kscn.obs_w
    h = hidden
    block_envs = pick_block_envs(n_envs, block_envs)
    assert n_steps % t_chunk == 0, (n_steps, t_chunk)
    n_blocks = n_envs // block_envs
    n_chunks = n_steps // t_chunk
    inv_b = 1.0 / float(n_steps * a * n_envs)

    kernel = functools.partial(
        _update_kernel, spec=spec, uses_comm=kscn.uses_comm,
        t_chunk=t_chunk, block_envs=block_envs, clip=clip,
        vf_coef=vf_coef, ent_coef=ent_coef, inv_b=inv_b,
        cd=compute_dtype)

    batch_spec = functools.partial(_batch_spec, t_chunk, block_envs)

    in_specs = [
        batch_spec(a, ow),                   # obs
        batch_spec(a, mw),                   # move one-hot
    ]
    if dim_c:
        in_specs.append(batch_spec(a, dim_c))
    else:
        in_specs.append(batch_spec(a))       # placeholder (= act rows)
    in_specs += [batch_spec(a)] * 4          # lpo, adv, ret, vold
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8   # weights

    whole = _whole_spec
    out_specs = (whole((h, ow)), whole((h, 1)), whole((h, h)),
                 whole((h, 1)), whole((ko, h)), whole((ko, 1)),
                 whole((4, 1)))
    acc_t = _acc_dtype(compute_dtype)
    out_shapes = tuple(jax.ShapeDtypeStruct(s.block_shape, acc_t)
                       for s in out_specs)

    grid_spec = pl.GridSpec(grid=(n_blocks, n_chunks),
                            in_specs=tuple(in_specs),
                            out_specs=out_specs)
    call = pl.pallas_call(kernel, grid_spec=grid_spec,
                          out_shape=out_shapes, interpret=interpret)

    @jax.jit
    def update(params, obs, mv_oh, cm_oh, logp_old, adv_n, ret, v_old):
        w1 = params["l1"]["w"].T.astype(acc_t)
        b1 = params["l1"]["b"].astype(acc_t)[:, None]
        w2 = params["l2"]["w"].T.astype(acc_t)
        b2 = params["l2"]["b"].astype(acc_t)[:, None]
        w3 = jnp.concatenate(
            [params["pi"]["w"].T, params["v"]["w"].T],
            axis=0).astype(acc_t)
        b3 = jnp.concatenate(
            [params["pi"]["b"], params["v"]["b"]], axis=0).astype(
                acc_t)[:, None]
        if cm_oh is None:
            cm_oh = jnp.zeros(mv_oh.shape[:2] + mv_oh.shape[3:], acc_t)
        dw1, db1, dw2, db2, dw3, db3, msum = call(
            obs, mv_oh, cm_oh, logp_old, adv_n, ret, v_old,
            w1, b1, w2, b2, w3, b3, w2.T, w3.T)
        grads = {
            "l1": {"w": dw1.T, "b": db1[:, 0]},
            "l2": {"w": dw2.T, "b": db2[:, 0]},
            "pi": {"w": dw3[: ko - 1].T, "b": db3[: ko - 1, 0]},
            "v": {"w": dw3[ko - 1 :].T, "b": db3[ko - 1 :, 0]},
        }
        pg = msum[0, 0] * inv_b
        vl = msum[1, 0] * inv_b
        ent = msum[2, 0] * inv_b
        return grads, (pg, vl, ent)

    update.block_envs = block_envs
    return update
