#!/usr/bin/env python
"""Train any of the four learners on any scenario: envs sharded over the
device mesh, gradients pmean-reduced, all rollout compute on device.
Prints a greedy-policy evaluation (reward per agent-step) at the end and
optionally checkpoints the trained parameters.

    python examples/train.py --algo mappo --scenario simple_spread --iters 600
    python examples/train.py --algo maddpg --scenario simple --save /tmp/p.npz
"""
import argparse
import os
import sys

sys.path.insert(1, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def greedy_eval(scn, algo, params, n_envs=128, n_steps=25, seed=123):
    """Reward per agent-step of the argmax (no-exploration) policy,
    rolled out env-minor on device — the methodology of the README
    learner table and tests/test_sharding.py."""
    import jax
    import jax.numpy as jnp

    from mpe_tpu.envs import MpeEnv
    from mpe_tpu.parallel import build_rollout

    env = MpeEnv(scn)
    a = env.n_agents
    mw = 2 * env.spec.dim_p + 1
    pad_c = env.action_width - mw

    def per_env_logits(obs):
        """[A, O] -> full-width action logits [A, W] (comm logits only
        for the REINFORCE head; others pad comm with zeros)."""
        if algo == "maddpg":
            from mpe_tpu.learner.maddpg import actor_logits_i
            return jax.vmap(actor_logits_i)(params["actor"], obs)
        if algo in ("mappo", "fused_mappo"):
            from mpe_tpu.learner.ppo import actor_logits
            return actor_logits(params, obs)
        if algo in ("ppo", "fused_ppo"):
            from mpe_tpu.learner.ppo import policy_value
            return policy_value(params, obs)[0]
        from mpe_tpu.learner.pg import policy_logits
        return policy_logits(params, obs)

    def pol(obs, key):
        logits = jax.vmap(per_env_logits, in_axes=-1, out_axes=-1)(obs)
        move = jax.nn.one_hot(jnp.argmax(logits[:, :mw], axis=1), mw,
                              dtype=env.dtype, axis=1)
        parts = [move]
        if logits.shape[1] > mw:          # REINFORCE comm head
            parts.append(jax.nn.one_hot(
                jnp.argmax(logits[:, mw:], axis=1),
                logits.shape[1] - mw, dtype=env.dtype, axis=1))
        elif pad_c:
            parts.append(jnp.zeros((a, pad_c, obs.shape[-1]), env.dtype))
        return jnp.concatenate(parts, axis=1)

    r = build_rollout(env, n_envs, n_steps, policy=pol, env_axis=-1)
    _, tot = r(jax.random.PRNGKey(seed))
    return float(tot) / (n_envs * n_steps * a)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenario", default="simple_spread")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--n-envs", type=int, default=64)
    ap.add_argument("--n-steps", type=int, default=25)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--algo", default="reinforce",
                    choices=["reinforce", "ppo", "mappo", "maddpg",
                             "fused_ppo", "fused_mappo"])
    ap.add_argument("--platform", default=None)
    ap.add_argument("--save", default=None, metavar="PATH",
                    help="checkpoint trained params (npz) at the end")
    ap.add_argument("--fused-collect", action="store_true",
                    help="maddpg: collect replay chunks with the "
                         "per-agent Pallas kernel (ops/fused_maddpg)")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax

    from mpe_tpu import scenarios
    from mpe_tpu.envs import MpeEnv
    from mpe_tpu.learner import build_train_step, init_policy
    from mpe_tpu.parallel import env_mesh

    scn = scenarios.load(args.scenario)
    env = MpeEnv(scn)
    mesh = env_mesh()
    # round down to a device multiple, but never to zero
    n_envs = max(args.n_envs - args.n_envs % mesh.devices.size,
                 mesh.devices.size)
    key = jax.random.PRNGKey(1)
    if args.algo == "maddpg":
        import jax.numpy as jnp
        from mpe_tpu.envs import MpeEnv as _MpeEnv
        from mpe_tpu.learner import (build_fused_collect, build_maddpg,
                                     init_buffer, init_maddpg)

        from mpe_tpu.learner.maddpg import maddpg_act_dim

        env = _MpeEnv(scn, max_steps=25, auto_reset=True)
        mw = maddpg_act_dim(env)   # move head + comm head if anyone speaks
        maddpg_envs = max(8, n_envs)
        capacity = maddpg_envs * 1600
        params = init_maddpg(jax.random.PRNGKey(0), scn.obs_width, mw,
                             env.n_agents)
        targets = jax.tree.map(lambda x: x, params)
        reset_fn, collect_fn, update_fn, init_opt = build_maddpg(
            env, n_envs=maddpg_envs, capacity=capacity, batch=1024,
            tau_polyak=0.01,
            # scaled off --lr so flags take effect; defaults land on the
            # swept 1e-3/1e-3 config (greedy -6.1 on spread @24k iters;
            # tau 0.05 or batch 512 collapse to worse-than-random)
            actor_lr=args.lr / 3, critic_lr=args.lr / 3)
        opt_states = init_opt(params)
        buffer = init_buffer(capacity, env.n_agents, scn.obs_width, mw)
        # critic-only warmup scales with the run length
        actor_start = min(1000, max(1, args.iters // 3))
        if args.fused_collect:
            # replay collected by the per-agent-network Pallas kernel
            # (ops/fused_maddpg): one horizon-length chunk per iteration
            # + `horizon` single-kernel updates on pre-gathered batches
            # (build_fused_update_chunk) keeps the per-transition update
            # ratio of the per-step loop. For long runs prefer
            # examples/maddpg_run.py, which additionally lax.scans the
            # chunks on-device (24k updates in ~2 min on one chip).
            from mpe_tpu.learner import build_fused_update_chunk

            horizon = env.max_steps
            # the gate below counts UPDATES (it*horizon+k); rescale so
            # the critic-only warmup matches the per-step loop's swept
            # 1000-update start instead of firing horizon× earlier
            actor_start = min(1000, max(1, args.iters * horizon // 3))
            collect = build_fused_collect(
                env, n_envs=maddpg_envs, n_steps=horizon,
                block_envs=min(1024, maddpg_envs),
                interpret=jax.default_backend() == "cpu")
            update_chunk = build_fused_update_chunk(
                env, horizon, batch=1024, tau_polyak=0.01,
                actor_lr=args.lr / 3, critic_lr=args.lr / 3,
                interpret=jax.default_backend() == "cpu")
            for i in range(max(1, 200 // horizon)):   # buffer warmup
                buffer, _ = collect(params["actor"], buffer, i)
            for it in range(args.iters):
                buffer, mr = collect(params["actor"], buffer,
                                     10_000 + it)
                k = jnp.arange(horizon)
                # within-chunk parity, matching the per-step loop's swept
                # cadence (and examples/maddpg_run.py)
                gates = (it * horizon + k >= actor_start) & (k % 2 == 0)
                params, targets, opt_states, m = update_chunk(
                    params, targets, opt_states, buffer,
                    jax.random.fold_in(key, 90_000 + it), gates)
                if it % 20 == 0 or it == args.iters - 1:
                    print(f"iter {it:5d}  reward/step {float(mr):+.3f}  "
                          f"q {float(m['q']):+.2f}")
        else:
            states, obs = reset_fn(key)
            for i in range(200):   # buffer warmup
                states, obs, buffer, _ = collect_fn(
                    params, states, obs, buffer, jax.random.fold_in(key, i))
            for it in range(args.iters):
                states, obs, buffer, mr = collect_fn(
                    params, states, obs, buffer,
                    jax.random.fold_in(key, 10_000 + it))
                params, targets, opt_states, m = update_fn(
                    params, targets, opt_states, buffer,
                    jax.random.fold_in(key, 90_000 + it),
                    (it >= actor_start) and (it % 2 == 0))
                if it % 500 == 0 or it == args.iters - 1:
                    print(f"iter {it:5d}  reward/step {float(mr):+.3f}  "
                          f"q {float(m['q']):+.2f}")
    elif args.algo in ("fused_ppo", "fused_mappo"):
        # rollout collection inside the Pallas kernel (learner/fused_ppo)
        from mpe_tpu.learner import (build_fused_mappo_step,
                                     build_fused_ppo_step)

        build = (build_fused_mappo_step if args.algo == "fused_mappo"
                 else build_fused_ppo_step)
        n_steps = args.n_steps
        t_chunk = next(c for c in (8, 5, 4, 2, 1) if n_steps % c == 0)
        step = build(args.scenario, mesh,
                     n_envs=max(n_envs, mesh.devices.size),
                     n_steps=n_steps, horizon=25, t_chunk=t_chunk,
                     lr=args.lr, anneal_iters=args.iters,
                     interpret=jax.default_backend() == "cpu")
        state = step.init_state(step.init_params(jax.random.PRNGKey(0)))
        for it in range(args.iters):
            state, m = step(state, it)
            if it % 10 == 0 or it == args.iters - 1:
                print(f"iter {it:4d}  reward/step "
                      f"{float(m['mean_reward']):+.3f}"
                      f"  entropy {float(m['entropy']):.3f}")
        params = state[0]
    elif args.algo in ("ppo", "mappo"):
        if args.algo == "mappo":
            from mpe_tpu.learner import build_mappo_step, init_mappo

            params = init_mappo(jax.random.PRNGKey(0), scn.obs_width,
                                2 * env.spec.dim_p + 1, env.n_agents)
            build = build_mappo_step
        else:
            from mpe_tpu.learner import build_ppo_step, init_ac

            params = init_ac(jax.random.PRNGKey(0), scn.obs_width,
                             2 * env.spec.dim_p + 1)
            build = build_ppo_step
        step = build(env, mesh, n_envs=max(n_envs, mesh.devices.size),
                     n_steps=args.n_steps, lr=args.lr,
                     anneal_iters=args.iters)
        state = step.init_state(params)
        for it in range(args.iters):
            state, m = step(state, jax.random.fold_in(key, it))
            if it % 10 == 0 or it == args.iters - 1:
                print(f"iter {it:4d}  reward/step {float(m['mean_reward']):+.3f}"
                      f"  entropy {float(m['entropy']):.3f}")
        params = state[0]
    else:
        params = init_policy(jax.random.PRNGKey(0), scn.obs_width,
                             env.action_width)
        train = build_train_step(env, mesh, n_envs=n_envs,
                                 n_steps=args.n_steps, lr=args.lr)
        for it in range(args.iters):
            params, loss = train(params, jax.random.fold_in(key, it))
            if it % 10 == 0 or it == args.iters - 1:
                print(f"iter {it:4d}  loss {float(loss):+.4f}")

    g = greedy_eval(scn, args.algo, params)
    print(f"greedy eval: reward per agent-step {g:+.3f}")
    if args.save:
        from mpe_tpu.utils.checkpoint import save_checkpoint

        save_checkpoint(args.save, params, step=args.iters)
        print(f"saved params -> {args.save}")


if __name__ == "__main__":
    main()
