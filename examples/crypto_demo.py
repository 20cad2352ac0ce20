#!/usr/bin/env python
"""Demonstrate a committed covert-communication policy (the r5
discovery — README crypto section): load a cipher checkpoint, print
Alice's codebook, and roll a few greedy episodes showing the message
each party reads.

    python examples/crypto_demo.py
    python examples/crypto_demo.py \
        --checkpoint checkpoints/crypto_pbt_grace0_repro_s9_m3.npz
"""

import argparse
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint",
                    default="checkpoints/crypto_pbt_grace_repro_s2_m5.npz")
    ap.add_argument("--episodes", type=int, default=6)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax

    from crypto_study import ALICE, BOB, EVE, best_response_errs, \
        eval_seed

    from mpe_tpu import scenarios
    from mpe_tpu.envs import MpeEnv
    from mpe_tpu.learner.maddpg import init_maddpg, maddpg_act_dim
    from mpe_tpu.utils.checkpoint import load_checkpoint

    scn = scenarios.load("simple_crypto")
    env = MpeEnv(scn)
    like = {"state": init_maddpg(jax.random.PRNGKey(0), scn.obs_width,
                                 maddpg_act_dim(env), env.n_agents)}
    params = load_checkpoint(args.checkpoint, like)[0]["state"]

    r = eval_seed(scn, params, n_envs=256)
    cb = r["alice_codebook"]
    bob_best, eve_best = best_response_errs(cb)
    print(f"checkpoint: {args.checkpoint}\n")
    print("Alice's codebook  msg(goal, key):")
    for g in range(2):
        for k in range(2):
            print(f"  goal={g} key={k}  ->  msg={cb[f'goal{g}_key{k}']}")
    xor = all(cb[f"goal{g}_key{k}"] == cb[f"goal{1-g}_key{1-k}"]
              for g in range(2) for k in range(2))
    print(f"\nXOR-structured: {xor}"
          f"   optimal-eavesdropper err: {eve_best} (1.0 = secure)"
          f"   key-holding-decoder err: {bob_best} (0.0 = decodable)")
    print(f"trained Bob err: {r['bob_err']}   "
          f"Bob err with the key blinded: {r['bob_err_keyless']} "
          f"(chance = 1.0)\n")

    # a few greedy episodes: who says what, who understands
    from mpe_tpu.learner.eval import greedy_state_rollout

    states, _ = greedy_state_rollout(scn, params, n_envs=args.episodes,
                                     n_steps=3, seed=7)
    comm = np.asarray(states.comm[-1])           # [n, A, 4] settled
    goal = np.asarray(states.goal[-1, :, 0])
    dim_c = scn.spec.dim_c
    print("episodes (settled utterances; msg = argmax of the channel):")
    for e in range(args.episodes):
        a_msg, b_msg, e_msg = (int(np.argmax(comm[e, i]))
                               for i in (ALICE, BOB, EVE))
        print(f"  goal={goal[e]}  alice says {a_msg}  |  "
              f"bob decodes -> {b_msg} "
              f"{'OK' if b_msg == goal[e] else 'WRONG'}  |  "
              f"eve guesses -> {e_msg} "
              f"{'(cracked)' if e_msg == goal[e] else '(fooled)'}")


if __name__ == "__main__":
    main()
