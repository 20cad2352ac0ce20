#!/usr/bin/env python
"""Role-aware evaluation of trained MADDPG policies on the competitive
scenarios, where aggregate reward is near zero by construction and the
paper's claims are about *behavior*:

  simple_adversary (physical deception, reference
  simple_adversary.py:80-118): good agents should reach/cover the goal
  while the goal-blind adversary stays confused — report min good-agent
  distance to goal, adversary distance to goal vs to the decoy landmark,
  and the fraction of episodes where the adversary ends nearer the goal
  than the decoy (0.5 = fully deceived, 1.0 = adversary always finds it).

  simple_push (keep-away, simple_push.py:62-74): the good agent should
  reach the goal; the adversary should sit on it / push the good agent
  off — report both agents' final distances to the goal.

Metrics are means over the last 5 steps of 25-step greedy episodes,
trained vs a uniform-random baseline. Writes tools/role_eval_report.json
(merging per-scenario sections across invocations).

    python tools/role_eval.py --scenario simple_adversary \
        --load checkpoints/maddpg_adversary.npz
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

TAIL = 5   # settled-behavior window: last TAIL steps of each episode


def _dist(p, q):
    return np.sqrt(np.sum(np.square(p - q), axis=-1))


def adversary_metrics(states, n_agents):
    """simple_adversary / simple_push share the layout: agent 0 is the
    adversary, landmarks follow the agent block, goal = state.goal[0]."""
    pos = states.pos[-TAIL:]                   # [TAIL, n, E, 2]
    goal = states.goal[-TAIL:, :, 0]           # [TAIL, n]
    lmk = pos[:, :, n_agents:]                 # [TAIL, n, L, 2]
    take = lambda idx: np.take_along_axis(
        lmk, idx[..., None, None].repeat(2, -1), axis=2)[:, :, 0]
    goal_pos = take(goal)                      # [TAIL, n, 2]
    decoy_pos = take(1 - goal)                 # two landmarks in both scns
    d_goal = _dist(pos[:, :, :n_agents], goal_pos[:, :, None])  # [TAIL,n,A]
    d_decoy = _dist(pos[:, :, :n_agents], decoy_pos[:, :, None])
    out = {
        "adv_goal_dist": float(d_goal[..., 0].mean()),
        "adv_decoy_dist": float(d_decoy[..., 0].mean()),
        "adv_nearer_goal_frac": float(
            (d_goal[..., 0] < d_decoy[..., 0]).mean()),
    }
    if n_agents > 2:
        out["min_good_goal_dist"] = float(d_goal[..., 1:].min(-1).mean())
        # deception coverage: each landmark has a good agent within 2x
        # its size (0.16) — the "split" behavior of the paper's fig. 2
        near_goal = (d_goal[..., 1:].min(-1) < 0.16)
        near_decoy = (d_decoy[..., 1:].min(-1) < 0.16)
        out["good_cover_both_frac"] = float((near_goal & near_decoy).mean())
    else:
        out["good_goal_dist"] = float(d_goal[..., 1].mean())
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenario", default="simple_adversary")
    ap.add_argument("--load", required=True)
    ap.add_argument("--n-envs", type=int, default=512)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--tag", default=None,
                    help="store under '<scenario>@<tag>' (variant runs)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax

    from mpe_tpu import scenarios
    from mpe_tpu.envs import MpeEnv
    from mpe_tpu.learner.eval import greedy_state_rollout
    from mpe_tpu.learner.maddpg import init_maddpg, maddpg_act_dim
    from mpe_tpu.utils.checkpoint import load_checkpoint

    scn = scenarios.load(args.scenario)
    env = MpeEnv(scn)
    tmpl = init_maddpg(jax.random.PRNGKey(0), scn.obs_width,
                       maddpg_act_dim(env), env.n_agents)
    payload, step, _ = load_checkpoint(args.load, {"state": tmpl})
    params = jax.tree.map(lambda x: x.astype(env.dtype), payload["state"])

    entry = {"checkpoint": args.load, "trained_updates": step,
             "n_envs": args.n_envs, "eval_seed": args.seed}
    for tag, p in (("trained", params), ("random", None)):
        states, rew = greedy_state_rollout(
            scn, p, n_envs=args.n_envs, n_steps=25, seed=args.seed)
        m = adversary_metrics(states, env.n_agents)
        m["reward_per_agent"] = [
            round(float(x), 4)
            for x in rew.sum((0, 1)) / (rew.shape[0] * rew.shape[1])]
        entry[tag] = m
        print(f"{args.scenario} [{tag}]: " + "  ".join(
            f"{k}={v:.3f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in m.items()), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "role_eval_report.json")
    report = {}
    if os.path.exists(out):
        with open(out) as fh:
            report = json.load(fh)
    key = (args.scenario if args.tag is None
           else f"{args.scenario}@{args.tag}")
    report[key] = entry
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"report -> {out}")


if __name__ == "__main__":
    main()
