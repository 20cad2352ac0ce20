#!/usr/bin/env python
"""Approximate-other-agents MADDPG (§4.2) vs vanilla — does dropping
the true-policy assumption cost anything on this engine?

The paper's claim (Lowe et al. 2017 §4.2, table of eq. 6-7 results):
bootstrapping TD targets through ONLINE-LEARNED approximations of the
other agents' policies, instead of their true target actors, reaches
the same performance. This study trains both variants with the
identical recipe/budget on the flagship cooperative scenario and a
competitive one, >=3 seeds, and reports greedy reward plus the
approximations' on-policy prediction accuracy (how well agent i's
model of agent j predicts j's greedy action on rollout states).

Writes tools/approx_study_report.json.

    python tools/approx_study.py --seeds 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def build_eval(scn):
    """Jitted params-as-args greedy eval -> (per-agent reward [A],
    stacked on-policy obs [N, A, O])."""
    import jax
    import jax.numpy as jnp

    from mpe_tpu.envs import MpeEnv
    from mpe_tpu.learner.maddpg import actor_logits_i

    env = MpeEnv(scn)
    mw = 2 * env.spec.dim_p + 1
    v_reset = jax.vmap(env.reset)
    v_step = jax.vmap(env.step)
    n_envs, n_steps = 128, 25

    @jax.jit
    def ev(actor_params, seed):
        def pol(obs):
            logits = jax.vmap(
                lambda o: jax.vmap(actor_logits_i)(actor_params, o))(
                obs)
            move = jax.nn.one_hot(jnp.argmax(logits[..., :mw], -1), mw,
                                  dtype=env.dtype)
            parts = [move]
            cwl = logits.shape[-1] - mw
            pad_c = env.action_width - mw
            if cwl:
                parts.append(jax.nn.one_hot(
                    jnp.argmax(logits[..., mw:], -1), cwl,
                    dtype=env.dtype))
            elif pad_c:
                parts.append(jnp.zeros(move.shape[:-1] + (pad_c,),
                                       env.dtype))
            return jnp.concatenate(parts, -1)

        key = jax.random.PRNGKey(seed)
        kr, ks = jax.random.split(key)
        states, obs = v_reset(jax.random.split(kr, n_envs))

        def body(carry, k):
            states, obs = carry
            states, obs2, rew, _, _ = v_step(states, pol(obs),
                                             jax.random.split(k, n_envs))
            return (states, obs2), (rew, obs)

        _, (rew, obs_t) = jax.lax.scan(body, (states, obs),
                                       jax.random.split(ks, n_steps))
        return rew.mean(axis=(0, 1)), obs_t.reshape(-1, *obs.shape[1:])

    return ev


def approx_accuracy(scn, params, obs):
    """Mean over (i, j != i) of P[approx_i^j argmax-move == agent j's
    greedy move] on the given on-policy obs."""
    import jax
    import jax.numpy as jnp

    from mpe_tpu.envs import MpeEnv
    from mpe_tpu.learner.maddpg import actor_logits_i

    env = MpeEnv(scn)
    a = env.n_agents
    mw = 2 * env.spec.dim_p + 1
    obs = jnp.asarray(obs, jnp.float32)
    true_logits = jax.vmap(
        lambda o: jax.vmap(actor_logits_i)(params["actor"], o))(obs)
    true_move = jnp.argmax(true_logits[..., :mw], -1)
    hits = []
    for i in range(a):
        p_row = jax.tree.map(lambda x: x[i], params["approx"])
        appr = jax.vmap(lambda p, o: actor_logits_i(p, o),
                        in_axes=(0, 1))(p_row, obs)
        pred = jnp.argmax(appr[..., :mw], -1)
        hits += [float((pred[j] == true_move[:, j]).mean())
                 for j in range(a) if j != i]
    return round(float(np.mean(hits)), 4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--scenarios", default="simple_spread,simple_adversary")
    ap.add_argument("--updates", type=int, default=24_000)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from mpe_tpu import scenarios
    from mpe_tpu.learner.approx_others import build_approx_runner
    from mpe_tpu.learner.fused_loop import build_fused_maddpg_runner

    report = {}
    for scen in args.scenarios.split(","):
        scn = scenarios.load(scen)
        ev = build_eval(scn)
        vanilla = build_fused_maddpg_runner(scen)
        approx = build_approx_runner(scen)
        rows = []
        for seed in range(args.seeds):
            pv, _ = vanilla(args.updates, seed=seed)
            rv, _ = ev(pv["actor"], 123)
            pa, _ = approx(args.updates, seed=seed)
            ra, obs = ev(pa["actor"], 123)
            acc = approx_accuracy(scn, pa, obs[:512])
            row = {"seed": seed,
                   "vanilla_greedy": round(float(np.mean(rv)), 3),
                   "approx_greedy": round(float(np.mean(ra)), 3),
                   "vanilla_per_agent": [round(float(x), 3)
                                         for x in np.asarray(rv)],
                   "approx_per_agent": [round(float(x), 3)
                                        for x in np.asarray(ra)],
                   "approx_move_accuracy": acc}
            rows.append(row)
            print(json.dumps({"scenario": scen, **row}), flush=True)
        report[scen] = {
            "updates": args.updates, "seeds": rows,
            "vanilla_mean": round(float(np.mean(
                [r["vanilla_greedy"] for r in rows])), 3),
            "approx_mean": round(float(np.mean(
                [r["approx_greedy"] for r in rows])), 3),
        }

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "approx_study_report.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"report -> {out}")


if __name__ == "__main__":
    main()
