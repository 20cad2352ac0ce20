#!/usr/bin/env python
"""Population search over the SPEAKER on simple_crypto — the last open
escape hatch of the covert-communication negative.

Prior rounds established (tools/crypto_study.py, crypto_stability.py):
gradient MADDPG never FINDS covert communication (0/45 seeds across
recipes incl. two-timescale schedules; reference
simple_crypto.py:97-121), yet the XOR equilibrium is absorbing once
installed (5/5), and Bob learns the decoder from scratch when only
Alice is seeded (10/10) — so the bottleneck is specifically ALICE'S
EXPLORATION across the plaintext->cipher ravine. This tool fires the
obvious remaining attack: population-based search over Alice's actor
parameters, with everything else still learned by gradient.

Method (PBT-style, per population seed):

  - P members, each a full independently-trained MADDPG state
    (Alice + Bob + Eve actors, critics) — round 0 trains each from
    scratch with the standard fused-loop recipe.
  - Each round: FITNESS per member = the greedy GAME reward of the
    alice/bob team against that member's own co-trained Eve —
    mean ||eve.c - goal||^2 - ||bob.c - goal||^2 per step (the
    reward structure of simple_crypto.py:97-114). This is a learning
    claim: no security oracle, no analytic shortcut in the loop — a
    cipher only scores once the member's own Bob decodes it and its
    own trained Eve fails to.
  - Selection: the bottom half clones a top-half member's FULL state
    and perturbs ALICE'S ACTOR ONLY — Gaussian parameter noise
    (sigma ladder) or a fresh re-draw of Alice — then every member
    trains another round_updates with the two-timescale fused loop
    (Bob/Eve/critics by gradient; Alice slow or frozen per
    --actor-period, so her perturbed codebook persists long enough
    for Bob to adapt).
  - The analytic best-response security of each member's codebook
    (crypto_study.best_response_errs) is computed for REPORTING and
    the final covert verdict only — never as fitness.

Verdict per member: covert = trained bob_err < 0.1 AND an OPTIMAL
eavesdropper's error >= 0.75 (same bar as crypto_study.py). Writes
tools/crypto_pbt_report.json (one section per --tag).

    python tools/crypto_pbt.py --pop-seeds 3
    python tools/crypto_pbt.py --pop-seeds 3 --actor-period 1,1,1000000 \
        --tag frozen_alice
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

from crypto_study import ALICE, BOB, EVE, best_response_errs


def build_errs_fn(scn, n_envs: int = 512, n_steps: int = 25):
    """-> jitted ``errs(actor_params, obs_mask, seed) -> (bob_err,
    eve_err)``: greedy rollout with the member's actors, mean
    ||c - goal||^2 per non-warmup step for Bob and Eve. ``actor_params``
    is a traced ARGUMENT (one compile serves every member/round —
    learner.eval's closures would recompile per params)."""
    import jax
    import jax.numpy as jnp

    from mpe_tpu.envs import MpeEnv
    from mpe_tpu.learner.maddpg import actor_logits_i

    env = MpeEnv(scn)
    mw = 2 * env.spec.dim_p + 1
    dim_c = scn.spec.dim_c
    v_reset = jax.vmap(env.reset)
    v_step = jax.vmap(env.step)

    @jax.jit
    def errs(actor_params, obs_mask, seed):
        key = jax.random.PRNGKey(seed)
        kr, ks = jax.random.split(key)
        states, obs = v_reset(jax.random.split(kr, n_envs))

        def pol(obs):
            obs = obs * obs_mask
            logits = jax.vmap(
                lambda o: jax.vmap(actor_logits_i)(actor_params, o))(obs)
            move = jax.nn.one_hot(jnp.argmax(logits[..., :mw], -1), mw,
                                  dtype=env.dtype)
            comm = jax.nn.one_hot(jnp.argmax(logits[..., mw:], -1),
                                  logits.shape[-1] - mw, dtype=env.dtype)
            return jnp.concatenate([move, comm], axis=-1)

        def body(carry, k):
            states, obs = carry
            states, obs, _, _, _ = v_step(states, pol(obs),
                                          jax.random.split(k, n_envs))
            return (states, obs), (states.comm, states.goal[:, 0])

        _, (comm, goal) = jax.lax.scan(
            body, (states, obs), jax.random.split(ks, n_steps))
        comm, goal = comm[1:], goal[1:]      # step-0 utterances are 0
        goal_c = jnp.eye(dim_c, dtype=comm.dtype)[goal]   # [T-1, n, C]
        e = lambda i: jnp.square(comm[:, :, i] - goal_c).sum(-1).mean()
        return e(BOB), e(EVE)

    return errs


def alice_codebook_np(actor_params, obs_width: int, dim_c: int, mw: int):
    """Alice's greedy 4-entry codebook msg(goal, key) by a NumPy forward
    pass (obs layout: [goal_color(dim_c), key_color(dim_c)], zero-padded
    — scenarios/simple_crypto.py observation)."""
    p = {k: {kk: np.asarray(vv[ALICE]) for kk, vv in v.items()}
         for k, v in actor_params.items()}
    pairs = [(g, k) for g in range(2) for k in range(2)]
    obs = np.zeros((len(pairs), obs_width), np.float32)
    for r, (g, k) in enumerate(pairs):
        obs[r, g] = 1.0
        obs[r, dim_c + k] = 1.0
    h = np.tanh(obs @ p["l1"]["w"] + p["l1"]["b"])
    h = np.tanh(h @ p["l2"]["w"] + p["l2"]["b"])
    logits = h @ p["out"]["w"] + p["out"]["b"]
    msg = np.argmax(logits[:, mw:], axis=-1)
    return {f"goal{g}_key{k}": int(m)
            for m, (g, k) in zip(msg, pairs)}


def perturb_alice(params, rng, mode: str, sigma: float, fresh_fn):
    """Clone ``params`` with ALICE's actor perturbed: ``gauss`` adds
    sigma-scaled Gaussian noise per leaf (scaled by the leaf's RMS with
    a floor, so near-zero heads can still move), ``reinit`` replaces
    her actor with a fresh random draw. Bob/Eve/critics untouched."""
    import jax
    import jax.numpy as jnp

    actor = params["actor"]
    if mode == "reinit":
        fresh = fresh_fn(int(rng.integers(2**31 - 1)))
        new_actor = jax.tree.map(
            lambda stacked, f: stacked.at[ALICE].set(f[ALICE]),
            actor, fresh["actor"])
    else:
        def leaf(x):
            scale = sigma * max(float(np.sqrt(np.mean(
                np.square(np.asarray(x[ALICE]))))), 0.1)
            noise = rng.normal(0.0, scale, x[ALICE].shape)
            return x.at[ALICE].set(
                x[ALICE] + jnp.asarray(noise, x.dtype))
        new_actor = jax.tree.map(leaf, actor)
    return {"actor": new_actor, "critic": params["critic"]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pop-seeds", type=int, default=3,
                    help="independent population runs")
    ap.add_argument("--pop-seed-start", type=int, default=0,
                    help="first population seed (all member seeds and "
                         "perturbation draws derive from the ABSOLUTE "
                         "population seed, so a single seed re-runs "
                         "deterministically)")
    ap.add_argument("--save-dir", default=None,
                    help="save each covert finalist's full params to "
                         "<save-dir>/crypto_pbt_<tag>_s<ps>_m<i>.npz")
    ap.add_argument("--pop", type=int, default=8, help="members")
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--r0-updates", type=int, default=4000)
    ap.add_argument("--round-updates", type=int, default=2000)
    ap.add_argument("--round-actor-start", type=int, default=200)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--ent-coef", type=float, default=0.01)
    ap.add_argument("--eps", type=float, default=0.1)
    ap.add_argument("--actor-period", default="1,1,8",
                    help="per-agent (eve,bob,alice) actor periods for "
                         "every training leg; a huge alice entry "
                         "freezes her between perturbations")
    ap.add_argument("--sigmas", default="0.5,1.0,2.0",
                    help="gauss-perturbation sigma ladder (relative to "
                         "per-leaf RMS)")
    ap.add_argument("--p-reinit", type=float, default=0.34,
                    help="probability a clone re-draws Alice fresh "
                         "instead of Gaussian-perturbing her")
    ap.add_argument("--grace", type=int, default=0,
                    help="rounds a freshly-perturbed member is EXEMPT "
                         "from replacement — the arm-1 history shows a "
                         "sampled perfect cipher scoring fitness 0 and "
                         "dying before its Bob could adapt; a grace "
                         "period lets the member's own Bob/Eve reach "
                         "the codebook's true value first (still pure "
                         "game-reward fitness, no oracle)")
    ap.add_argument("--tag", default="default")
    ap.add_argument("--harden", default=None,
                    help="instead of searching, load a covert-finalist "
                         "checkpoint and continue training it with the "
                         "FULL gradient (no actor freezing/periods), "
                         "evaluating at --harden-horizons — does a "
                         "FOUND small-margin cipher survive the "
                         "dynamics that erode it mid-search?")
    ap.add_argument("--harden-horizons", default="2000,6000,12000,24000")
    ap.add_argument("--census", type=int, default=0,
                    help="instead of searching, sample N fresh "
                         "random-init Alices and classify their greedy "
                         "codebooks (constant / leaky / half-cipher / "
                         "perfect) — the base-rate evidence behind the "
                         "'re-draws are near-constant' mechanism claim")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax

    from mpe_tpu import scenarios
    from mpe_tpu.envs import MpeEnv
    from mpe_tpu.learner.fused_loop import build_fused_maddpg_runner
    from mpe_tpu.learner.maddpg import init_maddpg, maddpg_act_dim

    scn = scenarios.load("simple_crypto")
    env = MpeEnv(scn)
    mw = 2 * env.spec.dim_p + 1
    aw = maddpg_act_dim(env)
    dim_c = scn.spec.dim_c
    period = tuple(int(p) for p in args.actor_period.split(","))
    sigmas = [float(s) for s in args.sigmas.split(",")]
    assert args.pop >= 2, "selection needs a population of at least 2"

    if args.harden:
        from crypto_study import eval_seed

        from mpe_tpu.utils.checkpoint import load_checkpoint

        like = {"state": init_maddpg(jax.random.PRNGKey(0),
                                     scn.obs_width, aw, env.n_agents)}
        init = load_checkpoint(args.harden, like)[0]["state"]
        full = build_fused_maddpg_runner(
            "simple_crypto", lr=args.lr, ent_coef=args.ent_coef,
            eps=args.eps)             # NO actor_period: full gradient
        traj = []
        for updates in [int(h) for h in
                        args.harden_horizons.split(",")]:
            params, _ = full(updates, seed=0, init_params=init,
                             actor_start=500)
            row = {"updates": updates, **eval_seed(scn, params)}
            row["covert"] = (row["bob_err"] < 0.1
                             and row["eve_best_response_err"] >= 0.75)
            traj.append(row)
            print(json.dumps(row), flush=True)
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "crypto_pbt_report.json")
        report = json.load(open(out)) if os.path.exists(out) else {}
        report[f"harden_{args.tag}"] = {
            "checkpoint": args.harden,
            "recipe": {"lr": args.lr, "ent_coef": args.ent_coef,
                       "eps": args.eps, "actor_start": 500},
            "trajectory": traj,
            "still_covert": traj[-1]["covert"]}
        with open(out, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"report -> {out}")
        return

    if args.census:
        import jax as _jax
        counts = {"constant": 0, "leaky": 0, "half": 0, "perfect": 0,
                  "degenerate_secure": 0}
        for n in range(args.census):
            p = init_maddpg(_jax.random.PRNGKey(500_000 + n),
                            scn.obs_width, aw, env.n_agents)
            cb = alice_codebook_np(p["actor"], scn.obs_width, dim_c, mw)
            bb, eb = best_response_errs(cb)
            if len(set(cb.values())) == 1:
                counts["constant"] += 1
            elif eb >= 0.75:
                counts["perfect" if bb == 0.0
                       else "degenerate_secure"] += 1
            elif eb == 0.5:
                counts["half"] += 1
            else:
                counts["leaky"] += 1
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "crypto_pbt_report.json")
        report = json.load(open(out)) if os.path.exists(out) else {}
        report["fresh_init_codebook_census"] = {"n": args.census,
                                                **counts}
        with open(out, "w") as fh:
            json.dump(report, fh, indent=1)
        print(json.dumps(report["fresh_init_codebook_census"]))
        return

    runner = build_fused_maddpg_runner(
        "simple_crypto", lr=args.lr, ent_coef=args.ent_coef,
        eps=args.eps, actor_period=period)
    errs_fn = build_errs_fn(scn)
    no_mask = np.ones((env.n_agents, scn.obs_width), np.float32)
    key_mask = no_mask.copy()
    key_mask[BOB, :dim_c] = 0.0     # Bob's key columns (crypto obs)

    def fresh_params(seed):
        return init_maddpg(jax.random.PRNGKey(seed), scn.obs_width, aw,
                           env.n_agents)

    def member_stats(params, seed=123):
        be, ee = errs_fn(params["actor"], no_mask, seed)
        be, ee = float(be), float(ee)
        codebook = alice_codebook_np(params["actor"], scn.obs_width,
                                     dim_c, mw)
        bob_best, eve_best = best_response_errs(codebook)
        return {"fitness": round(ee - be, 4),
                "bob_err": round(be, 4), "eve_err": round(ee, 4),
                "bob_best_response_err": bob_best,
                "eve_best_response_err": eve_best,
                "covert": be < 0.1 and eve_best >= 0.75,
                "codebook": codebook}

    pop_rows = []
    any_covert_ever = False
    for ps in range(args.pop_seed_start,
                    args.pop_seed_start + args.pop_seeds):
        rng = np.random.default_rng(90_000 + ps)
        members = []
        for m in range(args.pop):
            params, _ = runner(
                args.r0_updates, seed=ps * 1000 + m,
                collect_seed0=10_000 + 1000 * (ps * args.pop + m))
            members.append(params)
        age = [args.grace] * args.pop     # founders are judgeable
        history = []
        for rnd in range(args.rounds):
            stats = [member_stats(p) for p in members]
            order = np.argsort([-s["fitness"] for s in stats])
            n_cov = sum(s["covert"] for s in stats)
            any_covert_ever = any_covert_ever or n_cov > 0
            row = {"round": rnd, "n_covert": n_cov,
                   "best": stats[order[0]],
                   "fitness": [s["fitness"] for s in stats]}
            history.append({**row, "members": stats})
            print(json.dumps({"pop_seed": ps, **row}), flush=True)

            # selection + perturbation (skipped after the last round's
            # stats — those are the final verdicts). Replacement
            # targets: the worst members among those past their grace
            # period; clone sources: the overall top half.
            half = args.pop // 2
            lineage = []
            new_members = list(members)
            eligible = [int(m) for m in order[half:]
                        if age[int(m)] >= args.grace]
            for j, loser in enumerate(eligible):
                src = int(order[j % half])
                if rng.random() < args.p_reinit:
                    mode, sigma = "reinit", 0.0
                else:
                    mode = "gauss"
                    sigma = float(rng.choice(sigmas))
                new_members[loser] = perturb_alice(
                    members[src], rng, mode, sigma, fresh_params)
                age[loser] = -1            # ages to 0 below
                lineage.append({"member": loser, "from": src,
                                "op": mode, "sigma": sigma})
            history[-1]["lineage"] = lineage
            members = new_members
            age = [x + 1 for x in age]
            for m in range(args.pop):
                params, _ = runner(
                    args.round_updates, seed=ps * 1000 + 500 + m,
                    init_params=members[m],
                    actor_start=args.round_actor_start,
                    collect_seed0=(20_000 + 1000 *
                                   (ps * args.pop + m) + 97 * rnd))
                members[m] = params

        final = [member_stats(p) for p in members]
        # key-ablation control on any covert finalist: blinding Bob's
        # key must push him to chance if the cipher is key-based
        for m, s in enumerate(final):
            if s["covert"]:
                bk, _ = errs_fn(members[m]["actor"], key_mask, 123)
                s["bob_err_keyless"] = round(float(bk), 4)
                if args.save_dir:
                    from mpe_tpu.utils.checkpoint import save_checkpoint
                    path = os.path.join(
                        args.save_dir,
                        f"crypto_pbt_{args.tag}_s{ps}_m{m}.npz")
                    save_checkpoint(path, members[m], step=0)
                    s["checkpoint"] = path
                    print(f"covert finalist -> {path}", flush=True)
        n_cov = sum(s["covert"] for s in final)
        any_covert_ever = any_covert_ever or n_cov > 0
        pop_rows.append({"pop_seed": ps, "final": final,
                         "n_covert_final": n_cov, "history": history})
        print(json.dumps({"pop_seed": ps, "final_n_covert": n_cov,
                          "final_best": final[int(np.argmax(
                              [s["fitness"] for s in final]))]}),
              flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "crypto_pbt_report.json")
    report = {}
    if os.path.exists(out):
        with open(out) as fh:
            report = json.load(fh)
    report[args.tag] = {
        "recipe": {"pop": args.pop, "rounds": args.rounds,
                   "r0_updates": args.r0_updates,
                   "round_updates": args.round_updates,
                   "round_actor_start": args.round_actor_start,
                   "lr": args.lr, "ent_coef": args.ent_coef,
                   "eps": args.eps, "actor_period": list(period),
                   "sigmas": sigmas, "p_reinit": args.p_reinit,
                   "grace": args.grace},
        "pop_seeds": pop_rows,
        "n_covert_final_total": sum(r["n_covert_final"]
                                    for r in pop_rows),
        "any_covert_ever": any_covert_ever,
    }
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"report -> {out}")


if __name__ == "__main__":
    main()
