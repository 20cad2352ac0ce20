#!/usr/bin/env python
"""Covert-communication study on simple_crypto (reference
simple_crypto.py:97-121; MADDPG paper §5.2 "covert communication").

The game: Alice sees a goal color (one-hot over the 2 landmarks,
embedded in a dim_c=4 channel) and a random one-hot key shared with
Bob; she broadcasts a 4-wide message. Alice/Bob are rewarded when Bob's
utterance reconstructs the goal AND eavesdropper Eve's does not
(good = -||bob.c-goal||^2 + ||eve.c-goal||^2); Eve is rewarded for
reconstructing it (eve = -||eve.c-goal||^2). The paper's claim is that
MADDPG discovers key-based encryption: Bob decodes, Eve stays at
chance.

This study trains N independent seeds with the fused loop and measures,
per seed, under greedy (argmax) evaluation:

  bob_err / eve_err      mean ||c - goal||^2 over non-zero utterances
                         (one-hot outputs: 0 if right, 2 if wrong —
                         chance for a goal-blind guesser is 1.0)
  bob_err_keyless        Bob's error with his key observation zeroed —
                         the decryption control: if Bob actually uses
                         the key, blinding it must push him to chance
  alice_plaintext_frac   fraction of steps where Alice's message equals
                         the raw goal color (plaintext transmission)
  key_changes_msg_frac   fraction of (goal, key) pairs where Alice's
                         message differs between the two key values —
                         0 means the key is ignored (no encryption)

Because greedy policies make Alice's code a deterministic 4-entry
codebook msg(goal, key), the *information-theoretic* security of the
learned cipher is computable exactly — no retraining needed:

  eve_best_response_err  expected ||c-goal||^2 of an OPTIMAL
                         eavesdropper (argmax posterior goal given the
                         message, goal/key uniform): 0 = the code leaks
                         the goal to any competent eve, 1.0 = perfectly
                         secure (message marginal independent of goal,
                         e.g. msg = goal XOR key)
  bob_best_response_err  same for an optimal key-holding decoder:
                         0 = the codebook is decodable with the key

Verdict per seed: "covert" = Bob's TRAINED decoder works (bob_err <
0.1) AND the cipher is secure against a BEST-RESPONDING eve
(eve_best_response_err >= 0.75) — a trained eve merely failing to crack
a crackable code does not count. Writes tools/crypto_study_report.json.

    python tools/crypto_study.py --seeds 5 --updates 24000
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

EVE, BOB, ALICE = 0, 1, 2


def best_response_errs(codebook):
    """Exact optimal-decoder errors from Alice's deterministic codebook
    ``{"goal{g}_key{k}": msg}`` with goal, key ~ U{0,1}.

    An optimal decoder outputs the one-hot of its posterior argmax over
    the 2 goal colors; each wrong guess costs ||e_i - e_j||^2 = 2, so
    the expected error is 2 * P(argmax posterior is wrong). Eve
    conditions on the message only; Bob on (message, key)."""
    pairs = [(g, k, codebook[f"goal{g}_key{k}"]) for g in range(2)
             for k in range(2)]

    def err(cond):
        # group the 4 equiprobable (g, k) worlds by the decoder's view
        groups = {}
        for g, k, m in pairs:
            groups.setdefault(cond(k, m), []).append(g)
        # per group: best guess = majority goal; wrong worlds cost 2
        wrong = sum(len(gs) - max(gs.count(0), gs.count(1))
                    for gs in groups.values())
        return 2 * wrong / len(pairs)

    return err(lambda k, m: (k, m)), err(lambda k, m: m)   # bob, eve


def eval_seed(scn, params, n_envs=512, seed=123):
    import jax
    import jax.numpy as jnp

    from mpe_tpu.learner.eval import greedy_state_rollout
    from mpe_tpu.learner.maddpg import actor_logits_i

    dim_c = scn.spec.dim_c

    def errs(states):
        comm = states.comm[1:]                     # [T-1, n, A, 4]; step 0
        goal = states.goal[1:, :, 0]               # utterances are zeros
        goal_c = np.eye(dim_c, dtype=comm.dtype)[goal]      # [T-1, n, 4]
        e = lambda i: float(
            np.sum(np.square(comm[:, :, i] - goal_c), -1).mean())
        return e(BOB), e(EVE)

    # live evaluation
    states, _ = greedy_state_rollout(scn, params, n_envs=n_envs, seed=seed)
    bob_err, eve_err = errs(states)

    # key ablation: zero Bob's key input (obs cols 0:4 of agent 1 —
    # scenarios/simple_crypto.py observation layout)
    mask = np.ones((3, scn.obs_width), np.float32)
    mask[BOB, :dim_c] = 0.0
    states_k, _ = greedy_state_rollout(scn, params, n_envs=n_envs,
                                       seed=seed, obs_mask=mask)
    bob_err_keyless, _ = errs(states_k)

    # Alice's codebook: her greedy message for every (goal, key) pair.
    # Alice's obs = [goal_color(4), key_color(4)] (zero-padded to
    # obs_width); mw move logits come first in the actor output.
    mw = 2 * scn.spec.dim_p + 1
    pairs = [(g, k) for g in range(2) for k in range(2)]
    obs = np.zeros((len(pairs), scn.obs_width), np.float32)
    for r, (g, k) in enumerate(pairs):
        obs[r, g] = 1.0
        obs[r, dim_c + k] = 1.0
    alice_p = jax.tree.map(lambda x: x[ALICE], params["actor"])
    logits = jax.vmap(lambda o: actor_logits_i(alice_p, o))(
        jnp.asarray(obs))
    msg = np.asarray(jnp.argmax(logits[:, mw:], axis=-1))   # [4]
    plaintext = float(np.mean([m == g for m, (g, _) in zip(msg, pairs)]))
    key_changes = float(np.mean(
        [msg[2 * i] != msg[2 * i + 1] for i in range(2)]))

    codebook = {f"goal{g}_key{k}": int(m)
                for m, (g, k) in zip(msg, pairs)}
    bob_best, eve_best = best_response_errs(codebook)
    return {"bob_err": round(bob_err, 4), "eve_err": round(eve_err, 4),
            "bob_err_keyless": round(bob_err_keyless, 4),
            "alice_plaintext_frac": plaintext,
            "key_changes_msg_frac": key_changes,
            "bob_best_response_err": bob_best,
            "eve_best_response_err": eve_best,
            "alice_codebook": codebook}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--updates", type=int, default=24_000)
    ap.add_argument("--ent-coef", type=float, default=0.01)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--eps", type=float, default=0.1)
    ap.add_argument("--tag", default="default",
                    help="report section name for recipe variants")
    ap.add_argument("--actor-period", default=None,
                    help="comma-separated per-agent actor periods "
                         "(eve,bob,alice), e.g. '1,1,4' to update "
                         "Alice 4x slower than Bob/Eve (two-timescale "
                         "schedule; default: all agents every "
                         "actor-gated update)")
    ap.add_argument("--recompute", action="store_true",
                    help="re-derive the analytic best-response metrics "
                         "and covert flags for every stored section "
                         "from its codebooks (no retraining)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "crypto_study_report.json")
    if args.recompute:
        with open(out) as fh:
            report = json.load(fh)
        for tag, section in report.items():
            for row in section["seeds"]:
                bb, eb = best_response_errs(row["alice_codebook"])
                row["bob_best_response_err"] = bb
                row["eve_best_response_err"] = eb
                row["covert"] = row["bob_err"] < 0.1 and eb >= 0.75
            section["n_covert"] = sum(r["covert"]
                                      for r in section["seeds"])
            print(tag, "n_covert:", section["n_covert"])
        with open(out, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"report -> {out}")
        return
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from mpe_tpu import scenarios
    from mpe_tpu.learner.fused_loop import run_fused_maddpg

    scn = scenarios.load("simple_crypto")
    period = (None if args.actor_period is None else
              tuple(int(p) for p in args.actor_period.split(",")))
    rows = []
    for seed in range(args.seeds):
        params, _ = run_fused_maddpg(
            "simple_crypto", updates=args.updates, seed=seed,
            lr=args.lr, ent_coef=args.ent_coef, eps=args.eps,
            actor_period=period)
        row = {"seed": seed, **eval_seed(scn, params)}
        row["covert"] = (row["bob_err"] < 0.1
                         and row["eve_best_response_err"] >= 0.75)
        rows.append(row)
        print(json.dumps(row), flush=True)

    report = {}
    if os.path.exists(out):
        with open(out) as fh:
            report = json.load(fh)
    report[args.tag] = {
        "updates": args.updates, "lr": args.lr,
        "ent_coef": args.ent_coef, "eps": args.eps,
        "actor_period": (None if period is None else list(period)),
        "seeds": rows,
        "n_covert": sum(r["covert"] for r in rows),
    }
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"report -> {out}")


if __name__ == "__main__":
    main()
