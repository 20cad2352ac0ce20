"""Fused MADDPG update: the whole per-agent-network gradient — target
actions, TD targets, critic forward+backward, expected-Q actor gradient
— in ONE Pallas kernel.

The XLA update (learner/maddpg.py update_fn) is the MADDPG loop's
bottleneck: ~40 us per batch-1024 update on a v5e chip with the 2-D
replay ring (~118 us before it — tools/maddpg_ablate.py), a long chain
of ~60 SMALL per-agent matmuls ([64, 69] @ [69, 1024] etc.) whose
activations round-trip HBM between ops. This kernel (a) keeps every
activation in VMEM and (b) collapses the per-agent networks into
STACKED operands so the whole update is a couple dozen matmuls
regardless of agent count — measured 22.2 ns/transition in the
packed-space chunk trainer vs 27.9 for the XLA op-chain
(tools/maddpg_ablate.py chunk_update_* phases; PERF.md r4 item):

  - the sampled replay rows enter as ONE [W, N] column tensor (the
    row layout [obs | act | rew | obs2] transposed IS the kernel
    layout; the critic's joint input is a free contiguous slice);
  - activations carry all agents on sublanes ([A*H, N]);
  - layer-1 critics share their input (the joint) so their weights
    stack VERTICALLY ([A*H, J] @ [J, N] — zero waste);
  - per-agent hidden layers are block-diagonal matmuls executed as
    one matmul per TILE GROUP of 128//H agents (_tile_groups): the
    group block fills a 128-row MXU tile exactly, so A=3/H=64 does 2
    tiles of work where the full [A*H, A*H] form padded to 4 (and
    world_comm's A=6 does 3 instead of 9); backward passes contract
    the same weights transposed via ``dot_general`` (W.T never
    materializes);
  - weight-gradient outer products emit the packed group-diagonal
    blocks; cross-agent entries are masked to exact zeros so
    optimizer steps can run IN PACKED SPACE — building the packed
    operands from the [A, o, i] param pytrees costs ~16.5 us/update
    on chip (as much as the gradient itself), so
    learner.build_fused_update_chunk packs params/targets/adam
    moments once per chunk, scans every update packed
    (elementwise adam/polyak/gating are bit-identical), and unpacks
    once (grads_fn.pack_params / run_packed / unpack_params).

The update itself:

  1. target actions  : stacked target-actor MLP on s', per-head
                       first-argmax one-hots (``jnp.argmax`` tie-break);
  2. TD targets      : stacked target critics on (s', a') ->
                       y = r + gamma * Q' (episodes only truncate —
                       bootstrap through the horizon);
  3. critic grads    : d/dtheta mean_{A,B} (Q(s, a) - y)^2, hand-derived
                       backward through the two tanh layers;
  4. actor grads     : each agent maximizes the exact expectation of its
                       critic over its own discrete action grid under
                       its factored softmax policy (move x comm), others
                       fixed from the buffer, critic STOP-GRADIENT — the
                       gradient at the logits is analytic:
                       dE/dz = p * (qbar - E). Candidate Q values reuse
                       the critic's layer-1 pre-activation on the buffer
                       joint: subtract each agent's own-action columns
                       (one block-diag matmul), add the candidate's
                       precomputed delta column, and run layers 2-3 on
                       ALL (agent, candidate) pairs at once with
                       candidates lane-concatenated — the XLA path
                       re-runs layer 1 on C*B rows per agent;
  5. entropy bonus   : the exact adjoint of update_fn's
                       -sum p*log(p + 1e-10) form (the epsilon's
                       p/(p+eps) term included), so grads match
                       ``jax.grad`` at f64.

Gradients are pinned to ``jax.grad`` of the identical XLA losses by
tests/test_fused_maddpg_update.py (f64 interpret at 1e-9, plus a full
update_fn A/B against the genuine learner at f32), and value-checked on
hardware by tools/tpu_train_parity.py. Matmuls run in ``compute_dtype``
with f32 accumulation (``preferred_element_type``) — f32 by default
(MADDPG on spread is hyper-sensitive; see CLAUDE.md).

Reference algorithm: Lowe et al. 2017, cited at
/root/reference/README.md:65-78. The reference repo contains no
learner; this is net-new TPU machinery.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpe_tpu.ops.fused_policy import _argmax_onehot
from mpe_tpu.ops.fused_update import VPAD, _acc_dtype, _dot, _dot_nt


def _dot_tn(w, g, cd):
    """w [K, M], g [K, N] -> w.T @ g [M, N] (contraction over
    sublanes; the MXU consumes the transposed lhs natively, so the
    wrapper never materializes W.T)."""
    return jax.lax.dot_general(
        w.astype(cd), g.astype(cd), (((0,), (0,)), ((), ())),
        preferred_element_type=_acc_dtype(cd))

f32 = jnp.float32


def _cpad(a: int) -> int:
    """Row count for the stacked critic value heads: Mosaic computes
    M=1 / K=1 matmuls in reduced precision (see ops/fused_update.VPAD),
    so the single-agent case zero-pads the [A, A*H] head stack."""
    return a if a >= 2 else VPAD


def _softmax_eps(z, at, eps=1e-10):
    """Softmax over axis 0 of [K, M] with update_fn's epsilon-guarded
    entropy: returns (p, s, H) where H = -sum p*log(p+eps) [1, M] and
    s = log(p+eps) + p/(p+eps) is the exact per-row adjoint factor of
    that H (dH/dz_k = -p_k (s_k - sum_m p_m s_m))."""
    m = jnp.max(z, axis=0, keepdims=True)
    e = jnp.exp(z - m)
    p = (e / jnp.sum(e, axis=0, keepdims=True)).astype(at)
    lse = jnp.log(p + eps)
    s = lse + p / (p + eps)
    ent = -jnp.sum(p * lse, axis=0, keepdims=True)
    return p, s, ent


def _sum2(x):
    """Full [R, N] -> [1, 1] sum (two keepdims reduces, kernel-safe)."""
    return jnp.sum(jnp.sum(x, axis=1, keepdims=True), axis=0,
                   keepdims=True)


def _tile_groups(a: int, h: int, gsz: int):
    """Row-slice per agent group: the [A*H, A*H] block-diagonal hidden
    layers are computed as one matmul per GROUP of ``gsz`` agents whose
    combined height gsz*h fills a 128-row MXU tile exactly, instead of
    one [A*H, A*H] matmul that pays ~A/gsz x tile-padding flops on the
    zero off-diagonal blocks (A=3, H=64: 2 tiles' work instead of 4;
    world_comm A=6: 3 instead of 9). Slice starts are multiples of
    gsz*h = 128 (or of h when h % 128 == 0), so every slice is
    tile-aligned; the last group may be partial."""
    return [slice(g0 * h, min(g0 + gsz, a) * h)
            for g0 in range(0, a, gsz)]


def _maddpg_update_kernel(
    cols,
    w1a, b1a, w2a, b2a, w3a, b3a,
    w1c, b1c, w2c, b2c, w3c, b3c, w1c_act, dcand,
    t1a, tb1a, t2a, tb2a, t3a, tb3a,
    t1c, tb1c, t2c, tb2c, t3c, tb3c,
    dw1a, db1a, dw2a, db2a, dw3a, db3a,
    dw1c, db1c, dw2c, db2c, dw3c, db3c, msum,
    *, a: int, o: int, h: int, gsz: int, mw: int, cw: int,
    gamma: float, ent_coef: float, inv: float, block_b: int,
    cand_group: int, cd, ablate: str = "",
):
    at = _acc_dtype(cd)
    nb = block_b
    k = mw + cw
    cwx = max(cw, 1)
    n_cand = mw * cwx
    groups = _tile_groups(a, h, gsz)

    def gmm(wblk, x):
        """Group-diagonal [A*H, A*H] (x) [A*H, N] matmul (see
        _tile_groups); one full matmul when a*h fits a single group."""
        if len(groups) == 1:
            return _dot(wblk[:], x, cd)
        outs_ = [_dot(wblk[r, r], x[r], cd) for r in groups]
        return jnp.concatenate(outs_, axis=0)

    def gmm_t(wblk, g):
        """Group-diagonal W.T @ g via a transposed-lhs contraction —
        no materialized transpose (backward passes)."""
        if len(groups) == 1:
            return _dot_tn(wblk[:], g, cd)
        outs_ = [_dot_tn(wblk[r, r], g[r], cd) for r in groups]
        return jnp.concatenate(outs_, axis=0)

    outs = (dw1a, db1a, dw2a, db2a, dw3a, db3a,
            dw1c, db1c, dw2c, db2c, dw3c, db3c, msum)

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        for ref in outs:
            ref[:] = jnp.zeros_like(ref)

    # the replay row layout [obs | act | rew | obs2] transposed to
    # columns IS the kernel layout: one [W, nb] tensor, four slices —
    # and the critic's joint input is the contiguous [0 : A*(O+K)) block
    # (no concat, no per-field transposes in the wrapper)
    ao, ak = a * o, a * k
    cols_v = cols[:]                                      # [W, nb]
    x_obs = cols_v[:ao]                                   # [A*O, nb]
    x_act = cols_v[ao : ao + ak]                          # [A*K, nb]
    joint = cols_v[: ao + ak]                             # [J, nb]
    rew_v = cols_v[ao + ak : ao + ak + a]                 # [A, nb]
    obs2_v = cols_v[ao + ak + a :]                        # [A*O, nb]

    # 1. target actions: stacked target-actor MLP + per-head argmax
    if "target" in ablate:          # timing ablation: zero targets
        y = rew_v
    else:
        ht = jnp.tanh(_dot(t1a[:], obs2_v, cd) + tb1a[:])  # [A*H, nb]
        ht = jnp.tanh(gmm(t2a, ht) + tb2a[:])
        z2 = _dot(t3a[:], ht, cd) + tb3a[:]                # [A*K, nb]
        act2_rows = []
        for i in range(a):
            act2_rows.append(_argmax_onehot(z2[i * k : i * k + mw], at))
            if cw:
                act2_rows.append(
                    _argmax_onehot(z2[i * k + mw : (i + 1) * k], at))
        joint2 = jnp.concatenate([obs2_v] + act2_rows, axis=0)  # [J, nb]

        # 2. TD targets from the stacked target critics (the [_cpad(a)]
        # padded value-head rows are sliced off — see _cpad)
        g1 = jnp.tanh(_dot(t1c[:], joint2, cd) + tb1c[:])  # [A*H, nb]
        g2 = jnp.tanh(gmm(t2c, g1) + tb2c[:])
        qn = (_dot(t3c[:], g2, cd) + tb3c[:])[:a]          # [A, nb]
        y = rew_v + gamma * qn

    # 3. critic forward + TD gradient + backward (all agents at once)
    pre = _dot(w1c[:], joint, cd) + b1c[:]                # [A*H, nb]
    h1 = jnp.tanh(pre)
    h2 = jnp.tanh(gmm(w2c, h1) + b2c[:])
    q = (_dot(w3c[:], h2, cd) + b3c[:])[:a]               # [A, nb]
    d = (q - y).astype(at)
    g3 = (2.0 * inv) * d
    if _cpad(a) != a:               # zero-pad rows (M=1/K=1 precision)
        g3 = jnp.concatenate(
            [g3, jnp.zeros((_cpad(a) - a, nb), g3.dtype)], axis=0)
    if "cbwd" not in ablate:        # timing ablation: skip critic bwd
        gh2 = _dot_tn(w3c[:], g3, cd) * (1.0 - jnp.square(h2))
        gh1 = gmm_t(w2c, gh2) * (1.0 - jnp.square(h1))
        dw1c[:] = dw1c[:] + _dot_nt(gh1, joint, cd)       # [A*H, J]
        db1c[:] = db1c[:] + jnp.sum(gh1, axis=1, keepdims=True)
        for r in groups:   # group-diagonal blocks; off-blocks stay 0
            dw2c[r, r] = dw2c[r, r] + _dot_nt(gh2[r], h1[r], cd)
        db2c[:] = db2c[:] + jnp.sum(gh2, axis=1, keepdims=True)
        dw3c[:] = dw3c[:] + _dot_nt(g3, h2, cd)           # [cpad, A*H]
        db3c[:] = db3c[:] + jnp.sum(g3, axis=1, keepdims=True)
    closs_s = _sum2(d * d)
    q_s = _sum2(q)

    # 4. actor forward (stacked) + exact expected-Q gradient
    ha1 = jnp.tanh(_dot(w1a[:], x_obs, cd) + b1a[:])      # [A*H, nb]
    ha2 = jnp.tanh(gmm(w2a, ha1) + b2a[:])
    z = _dot(w3a[:], ha2, cd) + b3a[:]                    # [A*K, nb]

    # candidate Q for ALL (agent, candidate) pairs: layer-1 reuse
    if "cand" in ablate:            # timing ablation: candidate Q = q
        qs = [q.astype(at)] * n_cand
    else:
        base = pre - _dot(w1c_act[:], x_act, cd)          # [A*H, nb]
        qs = []                                           # C x [A, nb]
        for g0 in range(0, n_cand, cand_group):
            grp = list(range(g0, min(g0 + cand_group, n_cand)))
            c1 = jnp.tanh(jnp.concatenate(
                [base + dcand[:, c : c + 1] for c in grp], axis=1))
            c2 = jnp.tanh(gmm(w2c, c1) + b2c[:])          # [A*H, g*nb]
            qg = _dot(w3c[:], c2, cd) + b3c[:]            # [A, g*nb]
            for t in range(len(grp)):
                qs.append(qg[:, t * nb : (t + 1) * nb].astype(at))

    gz_rows = []
    aloss_s = jnp.zeros((1, 1), at)
    for i in range(a if "asoft" not in ablate else 0):
        pm, sm, ent_m = _softmax_eps(z[i * k : i * k + mw], at)
        if cw:
            pc, sc, ent_c = _softmax_eps(z[i * k + mw : (i + 1) * k], at)
            qbar_m = jnp.concatenate(
                [sum(pc[j : j + 1] * qs[m * cwx + j][i : i + 1]
                     for j in range(cwx)) for m in range(mw)], axis=0)
            qbar_c = jnp.concatenate(
                [sum(pm[m : m + 1] * qs[m * cwx + j][i : i + 1]
                     for m in range(mw)) for j in range(cwx)], axis=0)
        else:
            qbar_m = jnp.concatenate([qs[m][i : i + 1] for m in range(mw)],
                                     axis=0)              # [mw, nb]
        exp_q = jnp.sum(pm * qbar_m, axis=0, keepdims=True)   # [1, nb]

        gm = ((-1.0) * pm * (qbar_m - exp_q)
              + ent_coef * pm
              * (sm - jnp.sum(pm * sm, axis=0, keepdims=True))) * inv
        gz_rows.append(gm)
        ent = ent_m
        if cw:
            gc = ((-1.0) * pc * (qbar_c - exp_q)
                  + ent_coef * pc
                  * (sc - jnp.sum(pc * sc, axis=0, keepdims=True))) * inv
            gz_rows.append(gc)
            ent = ent_m + ent_c
        aloss_s = aloss_s + jnp.sum(exp_q + ent_coef * ent, axis=1,
                                    keepdims=True)

    gz = (jnp.concatenate(gz_rows, axis=0) if gz_rows
          else jnp.zeros((a * k, nb), at))                # [A*K, nb]
    if "abwd" not in ablate:        # timing ablation: skip actor bwd
        gha2 = _dot_tn(w3a[:], gz, cd) * (1.0 - jnp.square(ha2))
        gha1 = gmm_t(w2a, gha2) * (1.0 - jnp.square(ha1))
        dw1a[:] = dw1a[:] + _dot_nt(gha1, x_obs, cd)      # [A*H, A*O]
        db1a[:] = db1a[:] + jnp.sum(gha1, axis=1, keepdims=True)
        for r in groups:   # group-diagonal blocks; off-blocks stay 0
            dw2a[r, r] = dw2a[r, r] + _dot_nt(gha2[r], ha1[r], cd)
        db2a[:] = db2a[:] + jnp.sum(gha2, axis=1, keepdims=True)
        dw3a[:] = dw3a[:] + _dot_nt(gz, ha2, cd)          # [A*K, A*H]
        db3a[:] = db3a[:] + jnp.sum(gz, axis=1, keepdims=True)

    pad = jnp.zeros((1, 1), at)
    msum[:] = msum[:] + jnp.concatenate([closs_s, q_s, aloss_s, pad],
                                        axis=0)


def fused_maddpg_update(
    n_agents: int,
    obs_dim: int,
    act_dim: int,
    mw: int,
    hidden: int,
    batch: int,
    gamma: float = 0.95,
    ent_coef: float = 0.01,
    block_b: int = 1024,
    interpret: bool = False,
    compute_dtype=f32,
    ablate: str = "",
    cand_group: int | None = None,
):
    """Build ``grads_fn(params, targets, obs_b, act_b, rew_b, obs2_b)
    -> (grads, metrics)`` for the stacked per-agent pytrees of
    learner.maddpg.init_maddpg. Inputs are the sampled replay batch in
    row layout ([B, A, X] / [B, A] as stored by the Buffer); ``grads``
    matches ``jax.grad`` of learner.maddpg.update_fn's critic_loss /
    actor_loss (means over [A, B]); ``metrics`` is
    (critic_loss, actor_loss, q_mean)."""
    import numpy as np

    from mpe_tpu.ops.fused_rollout import pick_block_envs

    a = n_agents
    cw = act_dim - mw
    assert cw >= 0, (act_dim, mw)
    k = act_dim
    joint_w = a * (obs_dim + act_dim)
    h = hidden
    # VMEM pressure scales with the stacked-agent height a*h: the
    # activation tiles are [a*h, block_b] and the candidate tiles
    # [a*h, cand_group*block_b]. Shrink the env block for tall stacks
    # (world_comm's a*h=384 OOMs the 16MB VMEM at block_b=1024), then
    # give candidates the leftover lane budget.
    h_ref = 192  # spread's a*h, the tuned reference point
    while block_b > 128 and a * h * block_b > h_ref * 1024:
        block_b //= 2
    block_b = pick_block_envs(batch, block_b)
    n_blocks = batch // block_b
    inv = 1.0 / float(a * batch)
    cwx = max(cw, 1)
    n_cand = mw * cwx
    if cand_group is None:
        # lane-concat candidates in groups so the [A*H, group*block_b]
        # candidate activations stay within a few MB of VMEM
        cand_group = max(1, min(n_cand, 4096 // block_b,
                                (h_ref * 4 * 1024) // (a * h * block_b)))

    # agent-group size for the block-diagonal hidden layers (see
    # _tile_groups): groups of 128//h agents when h divides 128, one
    # agent per group when h is a multiple of 128 (slices stay
    # tile-aligned), else no grouping (full block-diag matmul)
    if h % 128 == 0:
        gsz = 1
    elif 128 % h == 0:
        gsz = 128 // h
    else:
        gsz = a

    kernel = functools.partial(
        _maddpg_update_kernel, a=a, o=obs_dim, h=h, gsz=gsz, mw=mw,
        cw=cw, gamma=float(gamma), ent_coef=float(ent_coef), inv=inv,
        block_b=block_b, cand_group=cand_group, cd=compute_dtype,
        ablate=ablate)

    def batch_spec(rows):
        return pl.BlockSpec((rows, block_b), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def whole(shape):
        return pl.BlockSpec(shape, lambda i: tuple([0] * len(shape)),
                            memory_space=pltpu.VMEM)

    row_w = a * (2 * obs_dim + k + 1)   # fused replay row width
    in_specs = ([batch_spec(row_w)]
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 26)
    out_specs = (
        whole((a * h, a * obs_dim)), whole((a * h, 1)),    # actor l1
        whole((a * h, a * h)), whole((a * h, 1)),          # actor l2
        whole((a * k, a * h)), whole((a * k, 1)),          # actor out
        whole((a * h, joint_w)), whole((a * h, 1)),        # critic l1
        whole((a * h, a * h)), whole((a * h, 1)),          # critic l2
        whole((_cpad(a), a * h)), whole((_cpad(a), 1)),    # critic out
        whole((4, 1)),                                     # metric sums
    )
    acc_t = _acc_dtype(compute_dtype)
    out_shapes = tuple(jax.ShapeDtypeStruct(s.block_shape, acc_t)
                       for s in out_specs)

    call = pl.pallas_call(
        kernel,
        grid_spec=pl.GridSpec(grid=(n_blocks,), in_specs=tuple(in_specs),
                              out_specs=out_specs),
        out_shape=out_shapes, interpret=interpret)

    aO = a * obs_dim
    eye = jnp.eye(a, dtype=acc_t)
    cand_np = np.zeros((n_cand, k), np.float32)
    for m in range(mw):
        for j in range(cwx):
            cand_np[m * cwx + j, m] = 1.0
            if cw:
                cand_np[m * cwx + j, mw + j] = 1.0
    cand = jnp.asarray(cand_np)

    def _blkdiag(w):
        """Stacked kernel-layout blocks [A, o, i] -> [A*o, A*i]."""
        _, o, i = w.shape
        full = (eye[:, None, :, None].astype(w.dtype)
                * w[:, :, None, :])                    # [A, o, A, i]
        return full.reshape(a * o, a * i)

    def _diagblocks(full, o, i):
        """[A*o, A*i] -> stacked diagonal blocks [A, o, i]."""
        r = full.reshape(a, o, a, i)
        return r[jnp.arange(a), :, jnp.arange(a), :]

    kl = lambda w: jnp.transpose(w, (0, 2, 1)).astype(acc_t)
    col = lambda b: b.reshape(-1, 1).astype(acc_t)  # [A, X] -> [A*X, 1]
    pl_ = lambda w: jnp.transpose(w, (0, 2, 1))     # kernel -> param

    def pack_params(p):
        """Params pytree (init_maddpg layout) -> the PACKED pytree of
        kernel operands, leaf for leaf (same tree structure, so adam
        moments pack with the same function): actor weights
        block-diagonal [A*o, A*i], critic l1 vertically stacked over
        the shared joint, critic value head zero-padded to _cpad(a)
        rows, biases as [A*X, 1] columns. Packing costs ~16 us on a
        v5e — the dominant per-update cost before the packed-space
        chunk scan (see build_fused_update_chunk), which is why the
        training loop carries PACKED state and unpacks once per
        chunk."""
        got = p["actor"]["l1"]["w"].shape
        assert got == (a, obs_dim, h), (
            f"actor l1 weight shape {got} != ({a}, {obs_dim}, {h}) — "
            "pass the init_maddpg dims (incl. hidden=) this builder was "
            "configured with")
        w3c, b3c = _blkdiag(kl(p["critic"]["out"]["w"])), col(
            p["critic"]["out"]["b"])
        if _cpad(a) != a:
            zw = jnp.zeros((_cpad(a) - a, w3c.shape[1]), w3c.dtype)
            w3c = jnp.concatenate([w3c, zw], axis=0)
            b3c = jnp.concatenate(
                [b3c, jnp.zeros((_cpad(a) - a, 1), b3c.dtype)], axis=0)
        return {
            "actor": {
                "l1": {"w": _blkdiag(kl(p["actor"]["l1"]["w"])),
                       "b": col(p["actor"]["l1"]["b"])},
                "l2": {"w": _blkdiag(kl(p["actor"]["l2"]["w"])),
                       "b": col(p["actor"]["l2"]["b"])},
                "out": {"w": _blkdiag(kl(p["actor"]["out"]["w"])),
                        "b": col(p["actor"]["out"]["b"])},
            },
            "critic": {
                "l1": {"w": kl(p["critic"]["l1"]["w"]).reshape(-1,
                                                               joint_w),
                       "b": col(p["critic"]["l1"]["b"])},
                "l2": {"w": _blkdiag(kl(p["critic"]["l2"]["w"])),
                       "b": col(p["critic"]["l2"]["b"])},
                "out": {"w": w3c, "b": b3c},
            },
        }

    def unpack_params(pk):
        """Inverse of pack_params (exact: packing only places values
        and zeros)."""
        return {
            "actor": {
                "l1": {"w": pl_(_diagblocks(pk["actor"]["l1"]["w"], h,
                                            obs_dim)),
                       "b": pk["actor"]["l1"]["b"].reshape(a, h)},
                "l2": {"w": pl_(_diagblocks(pk["actor"]["l2"]["w"], h,
                                            h)),
                       "b": pk["actor"]["l2"]["b"].reshape(a, h)},
                "out": {"w": pl_(_diagblocks(pk["actor"]["out"]["w"], k,
                                             h)),
                        "b": pk["actor"]["out"]["b"].reshape(a, k)},
            },
            "critic": {
                "l1": {"w": pl_(pk["critic"]["l1"]["w"].reshape(
                    a, h, joint_w)),
                       "b": pk["critic"]["l1"]["b"].reshape(a, h)},
                "l2": {"w": pl_(_diagblocks(pk["critic"]["l2"]["w"], h,
                                            h)),
                       "b": pk["critic"]["l2"]["b"].reshape(a, h)},
                "out": {"w": pl_(_diagblocks(
                    pk["critic"]["out"]["w"][:a], 1, h)),
                        "b": pk["critic"]["out"]["b"][:a].reshape(a, 1)},
            },
        }

    # 0/1 masks zeroing the cross-agent (and cross-pair) entries of the
    # packed weight-grad outer products, so packed-space optimizer steps
    # keep packed weights exactly block-diagonal
    def _mask_like(o_, i_):
        m = np.zeros((a * o_, a * i_), np.float32)
        for i in range(a):
            m[i * o_ : (i + 1) * o_, i * i_ : (i + 1) * i_] = 1.0
        return jnp.asarray(m)

    _grad_masks = {
        "actor": {"l1": _mask_like(h, obs_dim), "l2": _mask_like(h, h),
                  "out": _mask_like(k, h)},
        "critic": {"l2": _mask_like(h, h),
                   "out": jnp.concatenate(
                       [_mask_like(1, h),
                        jnp.zeros(((_cpad(a) - a) * 1, a * h),
                                  jnp.float32)], axis=0)},
    }

    def _run_packed(pkp, pkt, cols):
        """Packed params/targets + cols [W, B] -> (packed grads,
        metrics). The candidate-Q operands are derived from the packed
        critic l1 (same values as the param-layout slices)."""
        w1c = pkp["critic"]["l1"]["w"]                 # [A*H, J]
        w1c_act = jnp.stack([
            w1c[i * h : (i + 1) * h, aO + i * k : aO + (i + 1) * k]
            for i in range(a)])                        # [A, H, K]
        dcand = jnp.einsum("ahk,ck->ahc", w1c_act,
                           cand.astype(acc_t)).reshape(a * h, n_cand)

        def operands(pk):
            return (pk["actor"]["l1"]["w"], pk["actor"]["l1"]["b"],
                    pk["actor"]["l2"]["w"], pk["actor"]["l2"]["b"],
                    pk["actor"]["out"]["w"], pk["actor"]["out"]["b"],
                    pk["critic"]["l1"]["w"], pk["critic"]["l1"]["b"],
                    pk["critic"]["l2"]["w"], pk["critic"]["l2"]["b"],
                    pk["critic"]["out"]["w"], pk["critic"]["out"]["b"])

        outs = call(cols, *operands(pkp)[:6], *operands(pkp)[6:],
                    _blkdiag(w1c_act), dcand, *operands(pkt))
        (dw1a, db1a, dw2a, db2a, dw3a, db3a,
         dw1c, db1c, dw2c, db2c, dw3c, db3c, msum) = outs
        gm = _grad_masks
        grads = {
            "actor": {
                "l1": {"w": dw1a * gm["actor"]["l1"], "b": db1a},
                "l2": {"w": dw2a * gm["actor"]["l2"], "b": db2a},
                "out": {"w": dw3a * gm["actor"]["out"], "b": db3a},
            },
            "critic": {
                "l1": {"w": dw1c, "b": db1c},
                "l2": {"w": dw2c * gm["critic"]["l2"], "b": db2c},
                "out": {"w": dw3c * gm["critic"]["out"], "b": db3c},
            },
        }
        metrics = (msum[0, 0] * inv,            # critic loss
                   -msum[2, 0] * inv,           # actor loss
                   msum[1, 0] * inv)            # mean Q
        return grads, metrics

    def _run(params, targets, cols):
        """Param-layout convenience wrapper: pack, run, unpack the
        grads (the chunk trainer avoids this per-update round trip by
        scanning in packed space — see run_packed)."""
        pkg, metrics = _run_packed(pack_params(params),
                                   pack_params(targets), cols)
        return unpack_params(pkg), metrics

    @jax.jit
    def grads_fn(params, targets, obs_b, act_b, rew_b, obs2_b):
        rows = lambda x: x.reshape(x.shape[0], -1).T.astype(acc_t)
        cols = jnp.concatenate(
            [rows(obs_b), rows(act_b), rew_b.T.astype(acc_t),
             rows(obs2_b)], axis=0)
        return _run(params, targets, cols)

    @jax.jit
    def from_rows(params, targets, rows_b):
        """Gathered replay rows [B, W] (Buffer.data layout
        [obs | act | rew | obs2]) -> (grads, metrics) with ONE
        transpose — the chunk trainer's fast path (the 4-field split +
        per-field transposes of grads_fn are relayout work the kernel
        layout never needed)."""
        assert rows_b.shape[1] == a * (2 * obs_dim + k + 1), rows_b.shape
        return _run(params, targets, rows_b.T.astype(acc_t))

    @jax.jit
    def run_packed(pkp, pkt, rows_b):
        """Packed-space fast path: packed params/targets + gathered
        replay rows [B, W] -> (PACKED grads, metrics). The chunk
        trainer packs once per chunk, scans all updates in packed
        space (adam/polyak are elementwise, so packed-space optimizer
        steps are bit-identical on the real entries and keep the
        zero padding exactly zero via the grad masks), and unpacks
        once — amortizing the ~16 us/update packing cost ~n_updates x.
        """
        return _run_packed(pkp, pkt, rows_b.T.astype(acc_t))

    grads_fn.pack_params = jax.jit(pack_params)
    grads_fn.unpack_params = jax.jit(unpack_params)
    grads_fn.run_packed = run_packed
    grads_fn.from_rows = from_rows
    grads_fn.block_b = block_b
    return grads_fn
