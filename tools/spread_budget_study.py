#!/usr/bin/env python
"""Budget-matched MADDPG vs MAPPO on simple_spread (cooperative
navigation — the flagship cooperative scenario).

The README learner table's headline rows came from DIFFERENT budgets:
MAPPO's from ~6000 on-policy iters x 256 envs x 32-step rollouts =
49.2M environment transitions (the test_sharding.py recipe), MADDPG's
from 24k updates x 64 collection envs = 1.54M transitions (the
r2-reference 1-update-per-n_envs-transitions ratio). This study
settles which algorithm actually wins on this engine by giving each
its best-known recipe and matching the TRANSITION budget both ways,
>=3 seeds each:

  - maddpg @1.54M  (the classic recipe: tau 0.01, batch 1024, lr 1e-3)
  - maddpg @49.2M  (32x the data: 768k updates, same recipe; greedy-
                    eval checkpoints at 24k/120k/768k updates per seed
                    via the fused loop's exact-prefix property — the
                    saturation curve)
  - mappo  @49.2M  (the best-known recipe: 6000 iters, 256 envs,
                    32-step rollouts, lr 3e-4, 4 ppo epochs)
  - mappo  @1.54M  (188 iters, same recipe)

Metric: greedy (argmax) reward per agent-step, 128 envs x 25 steps
(the README table's methodology). Writes
tools/spread_budget_report.json.

    python tools/spread_budget_study.py --seeds 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

SCENARIO = "simple_spread"


def build_greedy_eval(scn, algo: str, n_envs: int = 128,
                      n_steps: int = 25):
    """Params-as-argument jitted greedy evaluator (one compile per
    algo, not per checkpoint) -> reward per agent-step."""
    import jax
    import jax.numpy as jnp

    from mpe_tpu.envs import MpeEnv

    env = MpeEnv(scn)
    mw = 2 * env.spec.dim_p + 1
    pad_c = env.action_width - mw
    v_reset = jax.vmap(env.reset)
    v_step = jax.vmap(env.step)

    @jax.jit
    def ev(params, seed):
        def logits_of(obs):                     # [n, A, O] -> [n, A, mw]
            if algo == "maddpg":
                from mpe_tpu.learner.maddpg import actor_logits_i
                return jax.vmap(lambda o: jax.vmap(actor_logits_i)(
                    params["actor"], o))(obs)[..., :mw]
            from mpe_tpu.learner.ppo import actor_logits
            return actor_logits(params, obs)[..., :mw]

        def pol(obs):
            move = jax.nn.one_hot(jnp.argmax(logits_of(obs), -1), mw,
                                  dtype=env.dtype)
            if pad_c:
                move = jnp.concatenate(
                    [move, jnp.zeros(move.shape[:-1] + (pad_c,),
                                     env.dtype)], -1)
            return move

        key = jax.random.PRNGKey(seed)
        kr, ks = jax.random.split(key)
        states, obs = v_reset(jax.random.split(kr, n_envs))

        def body(carry, k):
            states, obs = carry
            states, obs, rew, _, _ = v_step(states, pol(obs),
                                            jax.random.split(k, n_envs))
            return (states, obs), rew

        _, rew = jax.lax.scan(body, (states, obs),
                              jax.random.split(ks, n_steps))
        return rew.mean()

    return ev


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--maddpg-horizons", default="24000,120000,768000",
                    help="update counts for the MADDPG saturation "
                         "curve (each an exact prefix of the next; "
                         "the largest matches MAPPO's 49.2M-transition "
                         "budget at 64 envs/update)")
    ap.add_argument("--mappo-iters", default="188,6000",
                    help="on-policy iteration counts (256 envs x 32 "
                         "steps each; 188 matches MADDPG's 1.54M "
                         "budget, 6000 is the classic recipe)")
    ap.add_argument("--mappo-envs", type=int, default=256)
    ap.add_argument("--mappo-steps", type=int, default=32)
    ap.add_argument("--mappo-lr", type=float, default=3e-4)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    from mpe_tpu import scenarios
    from mpe_tpu.envs import MpeEnv
    from mpe_tpu.learner import build_mappo_step, init_mappo
    from mpe_tpu.learner.fused_loop import build_fused_maddpg_runner
    from mpe_tpu.parallel.mesh import env_mesh

    scn = scenarios.load(SCENARIO)
    report = {"scenario": SCENARIO,
              "transitions_per_maddpg_update": 64,
              "transitions_per_mappo_iter": args.mappo_envs * args.mappo_steps}

    # ---- MADDPG arms (fused loop; exact-prefix saturation curve) ----
    ev_maddpg = build_greedy_eval(scn, "maddpg")
    horizons = [int(h) for h in args.maddpg_horizons.split(",")]
    runner = build_fused_maddpg_runner(SCENARIO)
    maddpg_rows = []
    for seed in range(args.seeds):
        traj = []
        for updates in horizons:
            params, _ = runner(updates, seed=seed)
            g = float(ev_maddpg(params, 123))
            traj.append({"updates": updates,
                         "transitions": updates * 64,
                         "greedy": round(g, 3)})
            print(json.dumps({"algo": "maddpg", "seed": seed,
                              **traj[-1]}), flush=True)
        maddpg_rows.append({"seed": seed, "curve": traj})
    report["maddpg"] = {
        "recipe": {"n_envs": 64, "batch": 1024, "tau": 0.01,
                   "lr": 1e-3, "ent_coef": 0.01, "eps": 0.1},
        "seeds": maddpg_rows,
    }

    # ---- MAPPO arms ----
    ev_mappo = build_greedy_eval(scn, "mappo")
    mesh = env_mesh(np.asarray(jax.devices()))
    env = MpeEnv(scn, max_steps=25, auto_reset=True)
    iters_list = sorted(int(i) for i in args.mappo_iters.split(","))
    mappo_rows = []
    for seed in range(args.seeds):
        step = build_mappo_step(env, mesh, n_envs=args.mappo_envs,
                                n_steps=args.mappo_steps,
                                lr=args.mappo_lr,
                                anneal_iters=iters_list[-1])
        params = init_mappo(jax.random.PRNGKey(seed), scn.obs_width,
                            2 * env.spec.dim_p + 1, env.n_agents)
        state = step.init_state(params)
        key = jax.random.PRNGKey(1000 + seed)
        traj = []
        for it in range(iters_list[-1]):
            state, m = step(state, jax.random.fold_in(key, it))
            if it + 1 in iters_list:
                g = float(ev_mappo(state[0], 123))
                traj.append({
                    "iters": it + 1,
                    "transitions": (it + 1) * args.mappo_envs
                    * args.mappo_steps,
                    "greedy": round(g, 3)})
                print(json.dumps({"algo": "mappo", "seed": seed,
                                  **traj[-1]}), flush=True)
        mappo_rows.append({"seed": seed, "curve": traj})
    report["mappo"] = {
        "recipe": {"n_envs": args.mappo_envs,
                   "n_steps": args.mappo_steps,
                   "lr": args.mappo_lr, "ppo_epochs": 4},
        "seeds": mappo_rows,
    }

    # ---- matched-budget summary ----
    def mean_at(rows, key, value):
        vals = [p["greedy"] for r in rows for p in r["curve"]
                if p[key] == value]
        return round(float(np.mean(vals)), 3) if vals else None

    report["summary"] = {
        "budget_1.54M": {
            "maddpg": mean_at(maddpg_rows, "updates", horizons[0]),
            "mappo": mean_at(mappo_rows, "iters", iters_list[0]),
        },
        "budget_49.2M": {
            "maddpg": mean_at(maddpg_rows, "updates", horizons[-1]),
            "mappo": mean_at(mappo_rows, "iters", iters_list[-1]),
        },
    }
    print(json.dumps(report["summary"]))

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "spread_budget_report.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"report -> {out}")


if __name__ == "__main__":
    main()
