#!/usr/bin/env python
"""Does the simple_world_comm leader broadcast channel carry anything?

The leader adversary sees everything (forest-hidden prey included,
reference simple_world_comm.py:252-261) and broadcasts a dim_c=4
utterance that every adversary observes (:279). The channel can only
matter when prey actually hide in forests — otherwise every predator
sees the prey directly and the broadcast is redundant.

Method (the speaker_listener muted-comm methodology, multi-seed):
train N MADDPG seeds with the fused loop, then for each seed roll the
greedy policies and compare

  catch_rate        adversary-prey collisions per env-step
  live vs blinded   blinded = the 4 leader-comm columns of every
                    adversary observation zeroed at eval (exactly what
                    a silent leader produces, core.py:171-177)
  prey_hidden_frac  fraction of prey-steps spent inside a forest —
                    the mechanism gate: if prey never hide, the channel
                    has nothing to add and "within noise" is the
                    EXPECTED result, not a failure

Writes tools/worldcomm_leader_report.json with per-seed rows and the
paired live-blinded catch-rate delta.

    python tools/worldcomm_leader_study.py --seeds 3 --updates 24000
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

N_ADV, N_GOOD = 4, 2
LEADER_C_COLS = slice(30, 34)   # tail of adversary rows (observation())


def eval_seed(scn, params, n_envs=512, seed=123):
    from mpe_tpu.learner.eval import greedy_state_rollout

    spec = scn.spec
    a = spec.n_agents
    size = np.asarray(spec.size)
    # forest entity rows: obstacle, 2 food, then 2 forests (make_world
    # appends forests last, reference simple_world_comm.py:34-57)
    forest_rows = [a + 3, a + 4]
    thr_catch = (size[:N_ADV, None]
                 + size[None, N_ADV:a])                 # [adv, good]

    def metrics(states):
        pos = states.pos                                 # [T, n, E, 2]
        adv, good = pos[:, :, :N_ADV], pos[:, :, N_ADV:a]
        d = np.sqrt(((adv[:, :, :, None] - good[:, :, None]) ** 2
                     ).sum(-1))                          # [T, n, adv, good]
        caught = d < thr_catch                           # [T, n, adv, good]
        catches = caught.sum((-1, -2))                   # [T, n]
        forest = pos[:, :, forest_rows]                  # [T, n, 2, 2]
        df = np.sqrt(((good[:, :, :, None] - forest[:, :, None]) ** 2
                      ).sum(-1))                         # [T, n, good, 2]
        thr_hide = size[N_ADV:a, None] + size[forest_rows][None, :]
        hidden = (df < thr_hide).any(-1)   # [T, n, good] in any forest
        # the conditional instrument: the broadcast can only carry
        # information the predators lack when a prey is forest-hidden,
        # so measure catches OF HIDDEN PREY per hidden prey-step
        hidden_catches = (caught.sum(2) * hidden).sum(-1)   # [T, n]
        n_hidden = max(hidden.sum(), 1)
        return (float(catches.mean()), float(hidden.mean()),
                float(hidden_catches.sum() / n_hidden))

    rows = {}
    for tag, mask in (("live", None), ("blinded", _blind_mask(scn))):
        states, rew = greedy_state_rollout(scn, params, n_envs=n_envs,
                                           seed=seed, obs_mask=mask)
        catch, hidden, catch_h = metrics(states)
        rows[tag] = {"catch_rate": round(catch, 4),
                     "prey_hidden_frac": round(hidden, 4),
                     "hidden_prey_catch_rate": round(catch_h, 4),
                     "adv_reward": round(float(rew[..., :N_ADV].mean()), 4),
                     "prey_reward": round(float(rew[..., N_ADV:].mean()), 4)}
    rows["catch_delta_live_minus_blinded"] = round(
        rows["live"]["catch_rate"] - rows["blinded"]["catch_rate"], 4)
    rows["hidden_catch_delta"] = round(
        rows["live"]["hidden_prey_catch_rate"]
        - rows["blinded"]["hidden_prey_catch_rate"], 4)
    return rows


def _blind_mask(scn):
    mask = np.ones((scn.spec.n_agents, scn.obs_width), np.float32)
    mask[:N_ADV, LEADER_C_COLS] = 0.0
    return mask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--updates", type=int, default=24_000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--ent-coef", type=float, default=0.01)
    ap.add_argument("--eps", type=float, default=0.1)
    ap.add_argument("--tag", default="default")
    ap.add_argument("--save-dir", default=None,
                    help="save each seed's checkpoint as "
                         "maddpg_world_comm_s<seed>.npz")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from mpe_tpu import scenarios
    from mpe_tpu.learner.fused_loop import run_fused_maddpg

    scn = scenarios.load("simple_world_comm")
    rows = []
    for seed in range(args.seeds):
        params, _ = run_fused_maddpg(
            "simple_world_comm", updates=args.updates, seed=seed,
            lr=args.lr, ent_coef=args.ent_coef, eps=args.eps)
        if args.save_dir:
            from mpe_tpu.utils.checkpoint import save_checkpoint
            save_checkpoint(
                os.path.join(args.save_dir,
                             f"maddpg_world_comm_s{seed}.npz"),
                params, step=args.updates)
        row = {"seed": seed, **eval_seed(scn, params)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    deltas = [r["catch_delta_live_minus_blinded"] for r in rows]
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "worldcomm_leader_report.json")
    report = {}
    if os.path.exists(out):
        with open(out) as fh:
            report = json.load(fh)
    report[args.tag] = {
        "updates": args.updates, "lr": args.lr,
        "ent_coef": args.ent_coef, "eps": args.eps, "seeds": rows,
        "catch_delta_mean": round(float(np.mean(deltas)), 4),
        "catch_delta_std": round(float(np.std(deltas)), 4),
    }
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"report -> {out}")


if __name__ == "__main__":
    main()
