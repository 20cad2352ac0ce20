#!/usr/bin/env python
"""XOR-equilibrium STABILITY study on simple_crypto.

tools/crypto_study.py establishes that MADDPG never *finds* covert
communication on this suite (0/N seeds across recipes, incl.
two-timescale schedules; every reward-yielding equilibrium is a
key-free code an optimal eavesdropper cracks). This tool answers the
complementary question: is the covert equilibrium itself STABLE under
the learning dynamics, i.e. is the failure one of search or one of
dynamics?

Method: hand-construct the exact XOR cipher in the learner's own
network parameterization (tanh MLPs, init_maddpg layout) —

  alice:  msg  = goal XOR key   (2-unit XOR gadget in layer 1,
  bob:    goal = msg  XOR key    sign-readout through layer 2,
                                 ~+/-5.9 logit margins at the output)

— verify it evaluates covert untrained (bob_err 0, key ablation ->
chance, eve best-response err 1.0 = information-theoretically secure),
then train from that initialization with the standard fused-loop recipe
(random-init critics + random-init Eve, default 1000-update critic
warmup) and re-evaluate at increasing horizons. Because chunk seeds
derive only from (seed, chunk index), a shorter run is an exact prefix
of a longer one — the horizons trace one trajectory per seed.

Verdict per seed: "stable" = still covert (bob_err < 0.1, eve
best-response err >= 0.75) at the longest horizon. Writes
tools/crypto_stability_report.json (one section per --tag/--agents arm).

A second arm (--agents alice) seeds only the SPEAKER's half of the
cipher: Alice talks in XOR from step 0, Bob and Eve are random. If Bob
learns the decoder and the pair locks in, a one-sided seed suffices to
cross the plaintext->XOR ravine; --actor-period 1,1,8 additionally
holds the seeded Alice nearly still while Bob learns.

    python tools/crypto_stability.py --seeds 3
    python tools/crypto_stability.py --seeds 5 --agents alice \
        --actor-period 1,1,8 --tag alice_slow
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

from crypto_study import EVE, BOB, ALICE, eval_seed


def xor_actor(obs_width, act_dim, hidden, mw, *, a_idx, b_idx, dtype):
    """One agent's actor params implementing out = a XOR b, where a and
    b are the 0/1 indicators at obs columns ``a_idx``/``b_idx`` and the
    result selects comm logit mw+0 (XOR=0) vs mw+1 (XOR=1).

    Layer-1 XOR gadget: h0 = tanh(s(a-b-1/2)), h1 = tanh(s(b-a-1/2))
    with s=8 — h0+h1 is -2tanh(4) if a==b, ~0 if a!=b. Layer 2 reads
    the sign: y = tanh(1/4 (h0+h1) + 1/4) ~ -/+0.245. Output scales y
    to -/+5.9 comm logits; unused comm logits get bias -10; move
    logits stay 0 (agents are immobile in simple_crypto)."""
    import jax.numpy as jnp

    s, l2s, gain = 8.0, 0.25, 24.0
    w1 = np.zeros((obs_width, hidden), np.float32)
    b1 = np.zeros((hidden,), np.float32)
    w1[a_idx, 0], w1[b_idx, 0], b1[0] = s, -s, -0.5 * s
    w1[b_idx, 1], w1[a_idx, 1], b1[1] = s, -s, -0.5 * s
    w2 = np.zeros((hidden, hidden), np.float32)
    b2 = np.zeros((hidden,), np.float32)
    w2[0, 0] = w2[1, 0] = l2s
    b2[0] = l2s
    wo = np.zeros((hidden, act_dim), np.float32)
    bo = np.zeros((act_dim,), np.float32)
    wo[0, mw + 0], wo[0, mw + 1] = -gain, gain
    bo[mw + 2] = bo[mw + 3] = -10.0
    return {
        "l1": {"w": jnp.asarray(w1, dtype), "b": jnp.asarray(b1, dtype)},
        "l2": {"w": jnp.asarray(w2, dtype), "b": jnp.asarray(b2, dtype)},
        "out": {"w": jnp.asarray(wo, dtype), "b": jnp.asarray(bo, dtype)},
    }


def xor_equilibrium_params(scn, seed, hidden=64, agents=(ALICE, BOB)):
    """Full init_maddpg tree for simple_crypto with the actors in
    ``agents`` replaced by the exact XOR cipher/decoder; every other
    actor and ALL critics keep their random init (the critics learn the
    equilibrium's values during the standard warmup). ``agents=(ALICE,)``
    seeds only the speaker's half of the cipher — the "can Bob learn to
    decode a covert code that is already being spoken?" arm.

    Obs layout (scenarios/simple_crypto.py observation): alice sees
    [goal_color(4), key_color(4)] -> goal1 at col 1, key1 at col 5;
    bob sees [key_color(4), alice.c(4)] -> key1 at col 1, msg1 at
    col 5. msg = goal XOR key, so bob's msg XOR key = goal."""
    import jax
    import jax.numpy as jnp

    from mpe_tpu.envs import MpeEnv
    from mpe_tpu.learner.maddpg import init_maddpg, maddpg_act_dim

    env = MpeEnv(scn)
    aw = maddpg_act_dim(env)
    mw = 2 * scn.spec.dim_p + 1
    params = init_maddpg(jax.random.PRNGKey(seed), scn.obs_width, aw,
                         env.n_agents, hidden=hidden)
    dtype = jax.tree.leaves(params)[0].dtype
    crafted = {
        ALICE: xor_actor(scn.obs_width, aw, hidden, mw,
                         a_idx=1, b_idx=5, dtype=dtype),
        BOB: xor_actor(scn.obs_width, aw, hidden, mw,
                       a_idx=5, b_idx=1, dtype=dtype),
    }
    crafted = {a: t for a, t in crafted.items() if a in agents}
    actor = params["actor"]
    for agent, tree in crafted.items():
        actor = jax.tree.map(
            lambda stacked, leaf, _a=agent: stacked.at[_a].set(leaf),
            actor, {k: tree[k] for k in ("l1", "l2", "out")})
    return {"actor": actor, "critic": params["critic"]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--horizons", default="2000,6000,12000,24000",
                    help="update counts to evaluate at (each is an "
                         "exact prefix of the next, per-seed)")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--ent-coef", type=float, default=0.01)
    ap.add_argument("--eps", type=float, default=0.1)
    ap.add_argument("--agents", default="both",
                    choices=["both", "alice"],
                    help="which actors start at the crafted XOR "
                         "equilibrium: 'both' (stability arm) or "
                         "'alice' (speaker-only seeding — must Bob "
                         "learn the decoder and lock the pair in?)")
    ap.add_argument("--actor-period", default=None,
                    help="per-agent actor periods (eve,bob,alice), "
                         "e.g. '1,1,8' to hold the seeded Alice "
                         "nearly still while Bob learns")
    ap.add_argument("--tag", default=None,
                    help="report section name (default: --agents)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from mpe_tpu import scenarios
    from mpe_tpu.learner.fused_loop import run_fused_maddpg

    scn = scenarios.load("simple_crypto")
    horizons = [int(h) for h in args.horizons.split(",")]
    agents = {"both": (ALICE, BOB), "alice": (ALICE,)}[args.agents]
    period = (None if args.actor_period is None else
              tuple(int(p) for p in args.actor_period.split(",")))
    tag = args.tag or args.agents

    # sanity: the crafted cipher must evaluate as intended UNTRAINED —
    # fully covert with both halves seeded; with alice only, her
    # codebook must still be the secure XOR (bob is random)
    p0 = xor_equilibrium_params(scn, seed=0, agents=agents)
    r0 = eval_seed(scn, p0)
    assert r0["eve_best_response_err"] >= 1.0, r0
    assert r0["key_changes_msg_frac"] == 1.0, r0
    if BOB in agents:
        assert r0["bob_err"] < 0.01 and r0["bob_err_keyless"] > 0.9, r0
    print("crafted init (untrained):", json.dumps(r0), flush=True)

    rows = []
    for seed in range(args.seeds):
        init = xor_equilibrium_params(scn, seed=seed, agents=agents)
        traj = []
        for updates in horizons:
            params, _ = run_fused_maddpg(
                "simple_crypto", updates=updates, seed=seed,
                lr=args.lr, ent_coef=args.ent_coef, eps=args.eps,
                init_params=init, actor_period=period)
            r = {"updates": updates, **eval_seed(scn, params)}
            r["covert"] = (r["bob_err"] < 0.1
                           and r["eve_best_response_err"] >= 0.75)
            traj.append(r)
            print(json.dumps({"seed": seed, **r}), flush=True)
        rows.append({"seed": seed, "stable": traj[-1]["covert"],
                     "trajectory": traj})

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "crypto_stability_report.json")
    report = {}
    if os.path.exists(out):
        with open(out) as fh:
            report = json.load(fh)
        if "seeds" in report:    # migrate the single-section format
            report = {"both": report}
    report[tag] = {
        "recipe": {"lr": args.lr, "ent_coef": args.ent_coef,
                   "eps": args.eps, "horizons": horizons,
                   "actor_start": 1000, "agents": args.agents,
                   "actor_period": (None if period is None
                                    else list(period))},
        "untrained_sanity": r0,
        "seeds": rows,
        "n_stable": sum(r["stable"] for r in rows),
    }
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"report -> {out}")


if __name__ == "__main__":
    main()
