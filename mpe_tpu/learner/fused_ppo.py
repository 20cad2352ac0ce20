"""PPO / MAPPO on the fused Pallas engine: rollout collection runs
inside ONE kernel (env physics + policy MLP on the MXU + Gumbel-max
sampling, ops/fused_policy.fused_policy_trajectory), so the learner's
data pipeline moves at fused-rollout speed instead of the XLA
scan-of-steps speed of learner/ppo.py.

Division of labor:
  - the kernel emits the on-policy batch env-minor: obs the policy acted
    on [T, A, OW, N], sampled action indices [T, A, N] (+ comm indices
    for comm scenarios), rewards [T, R, N], and the bootstrap obs;
  - rollout-time log-probs and values are *recomputed* outside the
    kernel from the same parameters in one batched forward pass (an
    [OW, H] x [OW, T*A*N]-shaped einsum — MXU work, not a scan). With
    identical params this reproduces the sample-time quantities up to
    f32 compiler-difference noise (certified <= 1.2e-6 single-step by
    tools/tpu_parity.py), which PPO's ratio is insensitive to;
  - done flags are not emitted: every lane starts at t=0 and auto-resets
    on the shared horizon, so ``done[t] = (t + 1) % horizon == 0`` is
    deterministic (reference horizon semantics, make_env.py:60-64 era
    time-limit truncation treated as episode end, as in learner/ppo.py);
  - the PPO/MAPPO update itself is the same clipped-surrogate math as
    learner/ppo.py, operating directly on the env-minor layout (no
    transposes of the big trajectory tensors).

Multi-chip: the kernel runs per-device under ``shard_map`` with the env
axis sharded and per-device PRNG block offsets (sharded == single-device
streams), gradients ``pmean``-reduced — same model as learner/ppo.py.

Comm scenarios: the kernel samples factored categoricals (move x comm);
the surrogate treats them as independent heads, with silent agents'
comm factor masked out (their utterance is forced to zero, matching
core.py:176 semantics — no gradient should flow through it).
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from mpe_tpu.learner.ppo import init_ac, init_mappo
from mpe_tpu.ops.fused_policy import fused_policy_trajectory
from mpe_tpu.ops.kernel_scenarios import KernelScenario, kernel_scenario


def _resolve(scenario) -> KernelScenario:
    return (scenario if isinstance(scenario, KernelScenario)
            else kernel_scenario(scenario))


def _resolve_dtype(compute_dtype, mesh: Mesh):
    """None -> bf16 on TPU meshes, f32 elsewhere (CPU XLA has no
    bf16 x bf16 = f32 dot)."""
    if compute_dtype is not None:
        return compute_dtype
    return (jnp.bfloat16 if mesh.devices.flat[0].platform == "tpu"
            else jnp.float32)


def _torso_minor(l1, l2, obs, dt=jnp.float32):
    """Env-minor MLP torso: obs [..., OW, N] -> h [..., H, N]. ``dt`` is
    the matmul compute dtype (bf16 doubles MXU throughput; accumulation
    stays f32 via preferred_element_type — or f64 for exactness tests —
    master params stay f32)."""
    acc = jnp.float64 if obs.dtype == jnp.float64 else jnp.float32
    h = jnp.tanh(jnp.einsum("...on,oh->...hn", obs.astype(dt),
                            l1["w"].astype(dt),
                            preferred_element_type=acc)
                 + l1["b"][:, None])
    return jnp.tanh(jnp.einsum("...hn,hg->...gn", h.astype(dt),
                               l2["w"].astype(dt),
                               preferred_element_type=acc)
                    + l2["b"][:, None])


def _head_minor(head, h, dt=jnp.float32):
    """h [..., H, N] -> [..., K, N] (f32 out; f64 stays f64)."""
    out = jnp.float64 if h.dtype == jnp.float64 else jnp.float32
    return (jnp.einsum("...gn,gk->...kn", h.astype(dt),
                       head["w"].astype(dt),
                       preferred_element_type=out)
            + head["b"][:, None]).astype(out)


def _factored_onehots(kscn, act, cact):
    """Index tensors [..., A, N] -> (move one-hot [..., A, 5, N], comm
    one-hot [..., A, C, N] | None). Built ONCE per batch: the loss then
    reads log-probs by one-hot contraction — a per-lane
    ``take_along_axis`` gather here measured 5x slower on TPU (the same
    gather-vs-one-hot trap as the XLA path's goal selects, PERF.md)."""
    spec = kscn.spec
    mw = 2 * spec.dim_p + 1
    dim_c = spec.dim_c if kscn.uses_comm else 0
    mv = jax.nn.one_hot(act, mw, dtype=jnp.float32, axis=-2)
    cm = (jax.nn.one_hot(cact, dim_c, dtype=jnp.float32, axis=-2)
          if dim_c else None)
    return mv, cm


def _factored_logp_ent(kscn, logits, mv_oh, cm_oh):
    """Env-minor factored categorical: logits [..., A, 5+C, N], one-hot
    actions (from ``_factored_onehots``) -> (logp, entropy) [..., A, N],
    comm factor masked for silent agents."""
    spec = kscn.spec
    mw = 2 * spec.dim_p + 1
    dim_c = spec.dim_c if kscn.uses_comm else 0

    def one(lg, oh):
        ls = jax.nn.log_softmax(lg, axis=-2)
        lp = jnp.sum(ls * oh, axis=-2)
        ent = -jnp.sum(jax.nn.softmax(lg, axis=-2) * ls, axis=-2)
        return lp, ent

    lp, ent = one(logits[..., :mw, :], mv_oh)
    if dim_c:
        clp, cent = one(logits[..., mw:, :], cm_oh)
        a = spec.n_agents
        speak = jnp.asarray(
            [0.0 if spec.silent[i] else 1.0 for i in range(a)],
            jnp.float32)[:, None]
        lp = lp + clp * speak
        ent = ent + cent * speak
    return lp, ent


def _gae_minor(values, rewards, nonterm_t, last_value, gamma, lam):
    """Reverse-scan GAE over env-minor [T, ..., N] tensors; ``nonterm_t``
    is the deterministic [T] per-step non-terminal mask."""
    def body(carry, x):
        next_val, next_adv = carry
        value, reward, nonterm = x
        delta = reward + gamma * next_val * nonterm - value
        adv = delta + gamma * lam * nonterm * next_adv
        return (value, adv), adv

    nt = nonterm_t.reshape((-1,) + (1,) * (values.ndim - 1))
    nt = jnp.broadcast_to(nt, values.shape)
    (_, _), advs = jax.lax.scan(
        body, (last_value, jnp.zeros_like(last_value)),
        (values, rewards, nt), reverse=True)
    return advs, advs + values


def _agent_rewards(kscn, rew):
    """[T, R, N] reward rows -> per-agent [T, A, N] (shared-reward
    scenarios emit one row, broadcast per the reference's np.sum
    shared-reward convention environment.py:100-104)."""
    a = kscn.spec.n_agents
    if kscn.reward_rows == 1:
        return jnp.broadcast_to(rew, (rew.shape[0], a, rew.shape[2]))
    return rew


def _fused_trainer(kscn, mesh, opt, traj, actor, prep, loss_fn,
                   kernel_update, *, ppo_epochs, vf_coef, ent_coef,
                   axis_name, fused_update, init_params, n_transitions):
    """Shared PPO/MAPPO trainer scaffold around the fused engine: kernel
    rollout -> ``prep`` (algo-specific batch assembly: one-hots,
    rollout-time logp/value recompute, GAE) -> ``ppo_epochs`` epochs of
    either the single-kernel analytic gradient (``kernel_update``) or
    XLA ``jax.value_and_grad`` of ``loss_fn`` — gradients pmean-reduced
    over the mesh either way. Both builders delegate here so the
    schedule/epoch/scan/shard plumbing exists exactly once."""
    dim_c = kscn.spec.dim_c if kscn.uses_comm else 0

    def local_update(state, seed):
        params, opt_state = state
        my = jax.lax.axis_index(axis_name)
        outs = traj(seed, actor(params), my * jnp.int32(traj.n_blocks))
        if dim_c:
            obs, act, cact, rew, last_obs = outs
        else:
            obs, act, rew, last_obs = outs
            cact = act  # unused by the loss when dim_c == 0
        batch = prep(params, obs, act, cact, rew, last_obs)
        _, mv_oh, cm_oh, logp_old, value, adv, ret = batch

        if fused_update:
            # adv normalization hoisted out of the loss: adv is constant
            # across epochs (identical values to the in-loss form)
            adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)

            def epoch(carry, _):
                params, opt_state = carry
                grads, (pg, vl, ent) = kernel_update(
                    params, obs, mv_oh, cm_oh, logp_old, adv_n, ret,
                    value)
                loss = pg + vf_coef * vl - ent_coef * ent
                grads = jax.lax.pmean(grads, axis_name)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss, pg, vl, ent)
        else:

            def epoch(carry, _):
                params, opt_state = carry
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, batch)
                grads = jax.lax.pmean(grads, axis_name)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss, *aux)

        (params, opt_state), (losses, pgs, vls, ents) = jax.lax.scan(
            epoch, (params, opt_state), jnp.arange(ppo_epochs))
        metrics = {
            "loss": jax.lax.pmean(losses[-1], axis_name),
            "pg_loss": jax.lax.pmean(pgs[-1], axis_name),
            "v_loss": jax.lax.pmean(vls[-1], axis_name),
            "entropy": jax.lax.pmean(ents[-1], axis_name),
            "mean_reward": jax.lax.pmean(
                _agent_rewards(kscn, rew).mean(), axis_name),
        }
        return (params, opt_state), metrics

    @partial(shard_map, mesh=mesh, in_specs=(P(), P()),
             out_specs=(P(), P()), check_vma=False)
    def sharded(state, seed):
        return local_update(state, seed)

    @jax.jit
    def step(state, seed):
        return sharded(state, jnp.asarray(seed, jnp.int32))

    step.init_params = init_params
    step.init_state = lambda params: (params, opt.init(params))
    step.n_transitions = n_transitions
    return step


def build_fused_ppo_step(
    scenario,
    mesh: Mesh,
    n_envs: int,
    n_steps: int = 64,
    horizon: int = 100,
    hidden: int = 64,
    lr: float = 3e-4,
    gamma: float = 0.95,
    lam: float = 0.95,
    clip: float = 0.2,
    vf_coef: float = 0.5,
    ent_coef: float = 0.01,
    ppo_epochs: int = 4,
    anneal_iters: int | None = None,
    block_envs: int = 1024,
    t_chunk: int = 8,
    interpret: bool = False,
    axis_name: str = "env",
    compute_dtype=None,
    fused_update: bool = True,
):
    """Jitted data-parallel PPO iteration on the fused engine:
    ``ppo_step(train_state, seed) -> (train_state, metrics)`` where
    ``train_state = (params, opt_state)`` (params in learner.ppo.init_ac
    format — build with ``ppo_step.init_params(key)`` /
    ``ppo_step.init_state(params)``) and ``seed`` is a python/int32
    per-iteration PRNG seed for the kernel.

    Parameter-shared actor-critic: the kernel runs the actor (torso +
    pi head); the value head reads the same torso outside.

    ``compute_dtype`` is the update's matmul dtype (master params,
    accumulation, logits, and the surrogate all stay f32). bf16 is the
    default — it halves MXU time, and rollout-time log-probs/values are
    recomputed with the SAME forward, so the epoch-0 ratio is exactly 1
    regardless of dtype; pass ``jnp.float32`` for bitwise-conservative
    runs.

    ``fused_update=True`` (default) computes each epoch's gradient with
    the single-kernel forward+backward of ops/fused_update (activations
    never leave VMEM — the XLA epoch spills both hidden layers to HBM);
    its hand-derived gradient is pinned to ``jax.grad`` of the identical
    loss by tests/test_fused_update.py. ``False`` keeps the XLA
    ``jax.value_and_grad`` epoch."""
    from mpe_tpu.ops.fused_update import fused_ppo_update

    kscn = _resolve(scenario)
    compute_dtype = _resolve_dtype(compute_dtype, mesh)
    spec = kscn.spec
    mw = 2 * spec.dim_p + 1
    dim_c = spec.dim_c if kscn.uses_comm else 0
    sched = (optax.linear_schedule(lr, 0.0, anneal_iters * ppo_epochs)
             if anneal_iters else lr)
    opt = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(sched))
    n_dev = mesh.devices.size
    assert n_envs % n_dev == 0
    local_envs = n_envs // n_dev

    def init_params(key):
        return init_ac(key, kscn.obs_w, mw + dim_c, hidden=hidden)

    tmpl = jax.eval_shape(init_params, jax.random.PRNGKey(0))
    actor = lambda p: {"l1": p["l1"], "l2": p["l2"], "out": p["pi"]}
    traj = fused_policy_trajectory(
        kscn, {"l1": tmpl["l1"], "l2": tmpl["l2"], "out": tmpl["pi"]},
        local_envs, n_steps, horizon=horizon, block_envs=block_envs,
        t_chunk=t_chunk, interpret=interpret)

    nonterm_t = 1.0 - (jnp.arange(1, n_steps + 1) % horizon == 0).astype(
        jnp.float32)
    kernel_update = (
        fused_ppo_update(kscn, local_envs, n_steps, hidden, clip=clip,
                         vf_coef=vf_coef, ent_coef=ent_coef,
                         block_envs=block_envs, t_chunk=t_chunk,
                         interpret=interpret,
                         compute_dtype=compute_dtype)
        if fused_update else None)

    def forward(params, obs):
        """obs [..., A, OW, N] -> (logits [..., A, K, N], value
        [..., A, N])."""
        h = _torso_minor(params["l1"], params["l2"], obs, compute_dtype)
        return (_head_minor(params["pi"], h, compute_dtype),
                _head_minor(params["v"], h, compute_dtype)[..., 0, :])

    def loss_fn(params, batch):
        obs, mv_oh, cm_oh, logp_old, value_old, adv, ret = batch
        logits, value = forward(params, obs)
        logp, ent = _factored_logp_ent(kscn, logits, mv_oh, cm_oh)
        ratio = jnp.exp(logp - logp_old)
        adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg = -jnp.minimum(
            ratio * adv_n,
            jnp.clip(ratio, 1 - clip, 1 + clip) * adv_n).mean()
        v_clip = value_old + jnp.clip(value - value_old, -clip, clip)
        vloss = jnp.maximum(jnp.square(value - ret),
                            jnp.square(v_clip - ret)).mean()
        return (pg + vf_coef * vloss - ent_coef * ent.mean(),
                (pg, vloss, ent.mean()))

    def prep(params, obs, act, cact, rew, last_obs):
        """Per-agent values from the shared torso; GAE over per-agent
        rewards."""
        mv_oh, cm_oh = _factored_onehots(kscn, act, cact)
        logits, value = forward(params, obs)
        logp_old, _ = _factored_logp_ent(kscn, logits, mv_oh, cm_oh)
        logp_old = jax.lax.stop_gradient(logp_old)
        value = jax.lax.stop_gradient(value)
        _, last_value = forward(params, last_obs)
        adv, ret = _gae_minor(value, _agent_rewards(kscn, rew), nonterm_t,
                              jax.lax.stop_gradient(last_value), gamma, lam)
        return obs, mv_oh, cm_oh, logp_old, value, adv, ret

    return _fused_trainer(
        kscn, mesh, opt, traj, actor, prep, loss_fn, kernel_update,
        ppo_epochs=ppo_epochs, vf_coef=vf_coef, ent_coef=ent_coef,
        axis_name=axis_name, fused_update=fused_update,
        init_params=init_params, n_transitions=n_envs * n_steps)


def build_fused_mappo_step(
    scenario,
    mesh: Mesh,
    n_envs: int,
    n_steps: int = 64,
    horizon: int = 100,
    hidden: int = 64,
    lr: float = 3e-4,
    gamma: float = 0.95,
    lam: float = 0.95,
    clip: float = 0.2,
    vf_coef: float = 0.5,
    ent_coef: float = 0.01,
    ppo_epochs: int = 4,
    anneal_iters: int | None = None,
    block_envs: int = 1024,
    t_chunk: int = 8,
    interpret: bool = False,
    axis_name: str = "env",
    compute_dtype=None,
    fused_update: bool = True,
):
    """Jitted data-parallel MAPPO iteration on the fused engine (same
    contract as ``build_fused_ppo_step``; params in
    learner.ppo.init_mappo format). Decentralized actors run inside the
    kernel; the centralized critic reads the joint observation outside.
    Intended for collaborative scenarios (shared team reward).

    ``fused_update=True`` (default) computes each epoch's gradient with
    the single-kernel actor+critic forward/backward of
    ops/fused_update.fused_mappo_update (pinned to ``jax.grad`` by
    tests/test_fused_update.py); ``False`` keeps the XLA
    ``jax.value_and_grad`` epoch."""
    from mpe_tpu.ops.fused_update import fused_mappo_update

    kscn = _resolve(scenario)
    compute_dtype = _resolve_dtype(compute_dtype, mesh)
    spec = kscn.spec
    a = spec.n_agents
    mw = 2 * spec.dim_p + 1
    dim_c = spec.dim_c if kscn.uses_comm else 0
    sched = (optax.linear_schedule(lr, 0.0, anneal_iters * ppo_epochs)
             if anneal_iters else lr)
    opt = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(sched))
    n_dev = mesh.devices.size
    assert n_envs % n_dev == 0
    local_envs = n_envs // n_dev

    def init_params(key):
        return init_mappo(key, kscn.obs_w, mw + dim_c, a, hidden=hidden)

    tmpl = jax.eval_shape(init_params, jax.random.PRNGKey(0))
    actor = lambda p: {"l1": p["a1"], "l2": p["a2"], "out": p["pi"]}
    traj = fused_policy_trajectory(
        kscn, {"l1": tmpl["a1"], "l2": tmpl["a2"], "out": tmpl["pi"]},
        local_envs, n_steps, horizon=horizon, block_envs=block_envs,
        t_chunk=t_chunk, interpret=interpret)

    nonterm_t = 1.0 - (jnp.arange(1, n_steps + 1) % horizon == 0).astype(
        jnp.float32)
    kernel_update = (
        fused_mappo_update(kscn, local_envs, n_steps, hidden, clip=clip,
                           vf_coef=vf_coef, ent_coef=ent_coef,
                           block_envs=block_envs, t_chunk=t_chunk,
                           interpret=interpret,
                           compute_dtype=compute_dtype)
        if fused_update else None)

    def actor_logits(params, obs):
        h = _torso_minor(params["a1"], params["a2"], obs, compute_dtype)
        return _head_minor(params["pi"], h, compute_dtype)

    def central_value(params, obs):
        """obs [..., A, OW, N] -> joint-state value [..., N]."""
        joint = obs.reshape(obs.shape[:-3] + (a * kscn.obs_w,)
                            + obs.shape[-1:])
        h = _torso_minor(params["c1"], params["c2"], joint, compute_dtype)
        return _head_minor(params["v"], h, compute_dtype)[..., 0, :]

    def loss_fn(params, batch):
        obs, mv_oh, cm_oh, logp_old, value_old, adv, ret = batch
        logits = actor_logits(params, obs)
        value = central_value(params, obs)
        logp, ent = _factored_logp_ent(kscn, logits, mv_oh, cm_oh)
        ratio = jnp.exp(logp - logp_old)
        adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
        adv_b = adv_n[..., None, :]        # same team adv per agent
        pg = -jnp.minimum(
            ratio * adv_b,
            jnp.clip(ratio, 1 - clip, 1 + clip) * adv_b).mean()
        v_clip = value_old + jnp.clip(value - value_old, -clip, clip)
        vloss = jnp.maximum(jnp.square(value - ret),
                            jnp.square(v_clip - ret)).mean()
        return (pg + vf_coef * vloss - ent_coef * ent.mean(),
                (pg, vloss, ent.mean()))

    def prep(params, obs, act, cact, rew, last_obs):
        """Centralized value on the joint obs [T, N]; GAE over the TEAM
        reward (mean across agents)."""
        mv_oh, cm_oh = _factored_onehots(kscn, act, cact)
        logits = actor_logits(params, obs)
        logp_old, _ = _factored_logp_ent(kscn, logits, mv_oh, cm_oh)
        logp_old = jax.lax.stop_gradient(logp_old)
        value = jax.lax.stop_gradient(central_value(params, obs))
        last_value = jax.lax.stop_gradient(central_value(params, last_obs))
        team_rew = _agent_rewards(kscn, rew).mean(axis=-2)
        adv, ret = _gae_minor(value, team_rew, nonterm_t,
                              last_value, gamma, lam)
        return obs, mv_oh, cm_oh, logp_old, value, adv, ret

    return _fused_trainer(
        kscn, mesh, opt, traj, actor, prep, loss_fn, kernel_update,
        ppo_epochs=ppo_epochs, vf_coef=vf_coef, ent_coef=ent_coef,
        axis_name=axis_name, fused_update=fused_update,
        init_params=init_params, n_transitions=n_envs * n_steps)
