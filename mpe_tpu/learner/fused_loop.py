"""The fully-fused on-device MADDPG training loop, as a library call.

``examples/maddpg_run.py`` wraps this for the CLI; study tools
(tools/crypto_study.py, tools/worldcomm_leader_study.py) call it
directly for multi-seed sweeps. One ``run_fused_maddpg`` call keeps the
r2-reference update:transition ratio (1 update per n_envs transitions,
actor gated to every 2nd update after a critic warmup) and runs
collection + updates entirely on-chip: fused chunk collection
(ops/fused_maddpg) + the chunked update (learner.maddpg
build_fused_update_chunk), ``lax.scan``-ed in blocks.

``build_fused_maddpg_runner`` is the factory underneath: it builds the
collection/update machinery ONCE and returns a ``run(...)`` whose
schedule knobs (seed, actor_start, collection stream) are traced
arguments — so population/sweep tools (tools/crypto_pbt.py) can train
hundreds of short member-runs without re-tracing or re-compiling per
call.
"""

from __future__ import annotations

from functools import partial


def build_fused_maddpg_runner(scenario: str, n_envs: int = 64,
                              horizon: int = 25, batch: int = 1024,
                              tau: float = 0.01, lr: float = 1e-3,
                              ent_coef: float = 0.01, eps: float = 0.1,
                              block: int = 40, actor_period=None,
                              local_critic: bool = False):
    """Build the fused-MADDPG training machinery for ``scenario`` once;
    -> ``run(updates, seed, init_params=None, actor_start=1000,
    collect_seed0=10_000, progress=None) -> (params, info)``.

    Everything that changes between calls (seed-derived keys, the
    actor_start warmup boundary, the collection stream base) is a
    TRACED argument of the compiled block, so repeated ``run`` calls
    with the same static config reuse one executable — the contract
    population-search tools rely on. Chunk seeds derive only from
    ``(seed, chunk index)``, so a shorter run is an exact prefix of a
    longer one with the same seed.

    ``actor_period`` (optional, one int >= 1 per agent) makes the
    schedule TWO-TIMESCALE: agent j's actor steps only on every
    ``period[j]``-th parity slot of the GLOBAL actor-gate schedule
    (critic cadence unchanged; the slot ordinal counts k%2==0 slots
    from update 0, so the warmup's slots are part of the phase).
    ``(1,) * A`` reproduces the default schedule exactly; e.g.
    ``(1, 1, 4)`` on simple_crypto updates Alice (agent 2) 4x slower
    than Bob/Eve, so Bob's decoder can track Alice's drifting
    codebook — the coordination failure tools/crypto_study.py
    identified.

    ``local_critic=True`` trains INDEPENDENT DDPG instead: identical
    collection/schedule, but each critic sees only its own
    (obs_i, act_i) — the paper's decentralized baseline (XLA gradient
    engine; the Pallas update kernel is centralized-critic only).
    """
    import jax
    import jax.numpy as jnp

    from mpe_tpu import scenarios
    from mpe_tpu.envs import MpeEnv
    from mpe_tpu.learner import (build_fused_collect,
                                 build_fused_update_chunk, init_buffer,
                                 init_maddpg)
    from mpe_tpu.learner.maddpg import maddpg_act_dim

    cpu = jax.default_backend() == "cpu"
    scn = scenarios.load(scenario)
    env = MpeEnv(scn, max_steps=horizon, auto_reset=True)
    if actor_period is not None:
        actor_period = tuple(int(p) for p in actor_period)
        assert len(actor_period) == env.n_agents, (
            f"actor_period needs one entry per agent "
            f"({env.n_agents}), got {len(actor_period)}")
        assert all(p >= 1 for p in actor_period), (
            f"actor_period entries must be >= 1, got {actor_period}")
    aw = maddpg_act_dim(env)
    capacity = n_envs * 1600

    collect = build_fused_collect(
        env, n_envs=n_envs, n_steps=horizon,
        block_envs=min(1024, n_envs), eps_greedy=eps, interpret=cpu)
    update_chunk = build_fused_update_chunk(
        env, horizon, batch=batch, tau_polyak=tau,
        actor_lr=lr, critic_lr=lr, ent_coef=ent_coef, interpret=cpu,
        grad_engine="xla" if local_critic else "kernel",
        local_critic=local_critic)

    def chunk_body(carry, i):
        # the training state stays PACKED across every chunk of a block
        # (kernel-layout stacked weights; see build_fused_update_chunk
        # pack_state/packed_step) — only the actor is unpacked per chunk
        # for the collection kernel
        pstate, buffer, base_key, astart, cseed0 = carry
        buffer, mr = collect(update_chunk.actor_of(pstate), buffer,
                             cseed0 + i)
        k = jnp.arange(horizon)          # within-chunk update index
        gates = (i * horizon + k >= astart) & (k % 2 == 0)
        if actor_period is not None:
            # two-timescale: agent j steps on every period[j]-th
            # actor-gated update. Gating is within-chunk parity
            # (k % 2 == 0), so the gated-update ordinal is
            # i*ceil(horizon/2) + k//2 — NOT (i*horizon+k)//2, which
            # double-counts at odd-horizon chunk boundaries
            astep = i * ((horizon + 1) // 2) + k // 2
            per = jnp.asarray(actor_period, jnp.int32)   # [A]
            gates = gates[:, None] & (astep[:, None] % per[None, :]
                                      == 0)              # [horizon, A]
        pstate, m = update_chunk.packed_step(
            pstate, buffer, jax.random.fold_in(base_key, i), gates)
        return ((pstate, buffer, base_key, astart, cseed0),
                (mr, m["critic_loss"]))

    @partial(jax.jit, static_argnums=2)
    def run_block(carry, chunk0, n):
        return jax.lax.scan(chunk_body, carry,
                            chunk0 + jnp.arange(n, dtype=jnp.int32))

    def run(updates: int, seed: int = 0, init_params=None,
            actor_start: int = 1000, collect_seed0: int = 10_000,
            progress=None):
        n_chunks = max(1, updates // horizon)
        n_updates = n_chunks * horizon   # actual count (horizon mult.)
        params = (init_maddpg(jax.random.PRNGKey(seed), scn.obs_width,
                              aw, env.n_agents,
                              local_critic=local_critic)
                  if init_params is None else
                  jax.tree.map(lambda x: jnp.asarray(x, jnp.float32),
                               init_params))
        targets = jax.tree.map(lambda x: x, params)
        buffer = init_buffer(capacity, env.n_agents, scn.obs_width, aw)
        opt_states = update_chunk.init_opt(params)
        base_key = jax.random.PRNGKey(seed + 7)

        # buffer warmup (no updates): fill ~200 env-steps of replay
        for i in range(max(1, 200 // horizon)):
            buffer, _ = collect(params["actor"], buffer, i)

        carry = (update_chunk.pack_state(params, targets, opt_states),
                 buffer, base_key, jnp.int32(actor_start),
                 jnp.int32(collect_seed0))
        done_chunks = 0
        while done_chunks < n_chunks:
            n = min(block, n_chunks - done_chunks)
            carry, (mr, cl) = run_block(carry, jnp.int32(done_chunks), n)
            done_chunks += n
            if progress is not None:
                progress(done_chunks, n_chunks, float(mr[-1]),
                         float(cl[-1]))
        pstate = carry[0]
        params, targets, opt_states = update_chunk.unpack_state(pstate)

        info = {"scenario": scenario, "updates": n_updates,
                "n_envs": n_envs, "batch": batch, "tau": tau, "lr": lr,
                "seed": seed,
                "actor_period": (None if actor_period is None
                                 else list(actor_period))}
        return params, info

    run.env = env
    run.scenario = scn
    return run


def run_fused_maddpg(scenario: str, updates: int = 24_000,
                     n_envs: int = 64, horizon: int = 25,
                     batch: int = 1024, tau: float = 0.01,
                     lr: float = 1e-3, ent_coef: float = 0.01,
                     eps: float = 0.1, actor_start: int = 1000,
                     block: int = 40, seed: int = 0, progress=None,
                     actor_period=None, init_params=None):
    """Train MADDPG on ``scenario`` with the fully-fused loop.

    Returns ``(params, info)`` where ``info`` has the actual update
    count and the recipe. ``progress(done_chunks, n_chunks, mean_reward,
    critic_loss)`` is called once per scanned block. One-shot wrapper
    over ``build_fused_maddpg_runner`` (use the builder directly for
    many runs with one compile).

    ``init_params`` (optional) starts training from the given
    init_maddpg-structured pytree instead of a fresh init — e.g. a
    saved checkpoint, or a hand-constructed equilibrium whose
    stability under the learning dynamics is the question
    (tools/crypto_stability.py).
    """
    run = build_fused_maddpg_runner(
        scenario, n_envs=n_envs, horizon=horizon, batch=batch, tau=tau,
        lr=lr, ent_coef=ent_coef, eps=eps, block=block,
        actor_period=actor_period)
    return run(updates, seed=seed, init_params=init_params,
               actor_start=actor_start, progress=progress)
