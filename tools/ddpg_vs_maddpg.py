#!/usr/bin/env python
"""MADDPG vs independent DDPG — the MADDPG paper's CENTRAL comparison
(Lowe et al. 2017 §5.1, Fig. 6): does the centralized critic actually
matter, on this engine, scenario by scenario?

Both learners share everything — collection kernel, replay, schedule,
hyperparameters, actor nets — and differ ONLY in what the critic sees
(``local_critic=True`` = own (obs_i, act_i); tests/test_ddpg_baseline.py
pins the A=1 equivalence and the other-agent invariance).

  - Cooperative scenarios: same-population greedy reward per
    agent-step, 3 seeds each.
  - Competitive scenarios (the paper's geometry): CROSS-PLAY — good
    agents trained by algorithm X vs adversaries trained by algorithm
    Y over all seed pairs; the paper's claim is that MADDPG-trained
    agents beat DDPG-trained agents on BOTH sides of the game.

Writes tools/ddpg_vs_maddpg_report.json.

    python tools/ddpg_vs_maddpg.py --seeds 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

COOP = ("simple_spread", "simple_speaker_listener")
COMP = ("simple_adversary", "simple_push", "simple_tag")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--updates", type=int, default=24_000)
    ap.add_argument("--scenarios", default=",".join(COOP + COMP))
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    from approx_study import build_eval

    from mpe_tpu import scenarios
    from mpe_tpu.learner.fused_loop import build_fused_maddpg_runner

    report = {}
    for scen in args.scenarios.split(","):
        scn = scenarios.load(scen)
        adv = np.asarray(scn.spec.adversary)
        competitive = bool(adv.any() and not adv.all())
        ev = build_eval(scn)
        teams = {}
        for algo, local in (("maddpg", False), ("ddpg", True)):
            runner = build_fused_maddpg_runner(scen, local_critic=local)
            teams[algo] = [runner(args.updates, seed=s)[0]
                           for s in range(args.seeds)]

        from _study_util import select_rows

        if not competitive:
            section = {}
            for algo in ("maddpg", "ddpg"):
                vals = [float(np.mean(np.asarray(
                    ev(p["actor"], 123)[0])))
                    for p in teams[algo]]
                section[algo] = {"greedy_per_seed":
                                 [round(v, 3) for v in vals],
                                 "mean": round(float(np.mean(vals)), 3)}
                print(json.dumps({"scenario": scen, "algo": algo,
                                  **section[algo]}), flush=True)
            section["maddpg_advantage"] = round(
                section["maddpg"]["mean"] - section["ddpg"]["mean"], 3)
        else:
            def combined(good_p, adv_p):
                return select_rows(adv, adv_p["actor"],
                                   good_p["actor"])

            section = {}
            for g_algo in ("maddpg", "ddpg"):
                for a_algo in ("maddpg", "ddpg"):
                    gs, advs = [], []
                    for i, gp in enumerate(teams[g_algo]):
                        for j, op_ in enumerate(teams[a_algo]):
                            if g_algo == a_algo and i == j:
                                continue   # cross-play pairs only
                            r = np.asarray(
                                ev(combined(gp, op_), 123)[0])
                            gs.append(float(r[~adv].mean()))
                            advs.append(float(r[adv].mean()))
                    section[f"good_{g_algo}_vs_adv_{a_algo}"] = {
                        "good_reward": round(float(np.mean(gs)), 4),
                        "adv_reward": round(float(np.mean(advs)), 4),
                        "n_pairs": len(gs)}
                    print(json.dumps(
                        {"scenario": scen,
                         "pairing": f"good_{g_algo}_vs_adv_{a_algo}",
                         **section[f"good_{g_algo}_vs_adv_{a_algo}"]}),
                        flush=True)
            # the paper's read-outs: swap ONE side's algorithm, hold
            # the other side's fixed
            section["good_side_advantage_vs_ddpg_adv"] = round(
                section["good_maddpg_vs_adv_ddpg"]["good_reward"]
                - section["good_ddpg_vs_adv_ddpg"]["good_reward"], 4)
            section["adv_side_advantage_vs_maddpg_good"] = round(
                section["good_maddpg_vs_adv_maddpg"]["adv_reward"]
                - section["good_maddpg_vs_adv_ddpg"]["adv_reward"], 4)
        report[scen] = {"updates": args.updates, "seeds": args.seeds,
                        **section}

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ddpg_vs_maddpg_report.json")
    merged = {}
    if os.path.exists(out):          # per-scenario sections merge
        with open(out) as fh:
            merged = json.load(fh)
    merged.update(report)
    with open(out, "w") as fh:
        json.dump(merged, fh, indent=1)
    print(f"report -> {out}")


if __name__ == "__main__":
    main()
