#!/usr/bin/env python
"""Two-phase entropy-anneal probe on simple_crypto.

The fast-Eve + high-entropy search arms (tools/crypto_study.py,
fast_eve_ent10*) produce HALF-ciphers — Alice uses the key on both
goals and makes one message ambiguous (optimal-eavesdropper error 0.5)
— but no seed completes the cipher at constant entropy. This probe
tests the obvious follow-up: explore at high entropy (phase 1,
ent_coef 0.1), then anneal to the exploitation recipe (phase 2,
ent_coef 0.01, continuing from phase-1 params via
run_fused_maddpg(init_params=...)). Does the half-cipher harden into
the full XOR, or is it an attractor of its own?

Observed answer (3 seeds, committed in crypto_anneal_report.json):
half-ciphers PERSIST through the anneal but never complete; a
half-key-usage seed decays to key-free; one plaintext seed collapses
to a degenerate constant message (secure only because it carries no
information — Bob fails too). Together with the stability study this
says the equilibrium landscape is a lattice of partial-cipher
attractors, and gradient dynamics stay wherever they first land.

    python tools/crypto_anneal.py --seeds 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crypto_study import eval_seed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--updates", type=int, default=24_000,
                    help="updates per phase")
    ap.add_argument("--explore-ent", type=float, default=0.1)
    ap.add_argument("--anneal-ent", type=float, default=0.01)
    ap.add_argument("--actor-period", default="1,4,4")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from mpe_tpu import scenarios
    from mpe_tpu.learner.fused_loop import run_fused_maddpg

    scn = scenarios.load("simple_crypto")
    period = tuple(int(p) for p in args.actor_period.split(","))
    rows = []
    for seed in range(args.seeds):
        p1, _ = run_fused_maddpg(
            "simple_crypto", updates=args.updates, seed=seed,
            ent_coef=args.explore_ent, actor_period=period)
        r1 = {"phase": "explore", "ent_coef": args.explore_ent,
              **eval_seed(scn, p1)}
        print(json.dumps({"seed": seed, **r1}), flush=True)
        p2, _ = run_fused_maddpg(
            "simple_crypto", updates=args.updates, seed=seed + 100,
            ent_coef=args.anneal_ent, actor_period=period,
            init_params=p1)
        r2 = {"phase": "anneal", "ent_coef": args.anneal_ent,
              **eval_seed(scn, p2)}
        r2["covert"] = (r2["bob_err"] < 0.1
                        and r2["eve_best_response_err"] >= 0.75)
        print(json.dumps({"seed": seed, **r2}), flush=True)
        rows.append({"seed": seed, "explore": r1, "anneal": r2})

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "crypto_anneal_report.json")
    with open(out, "w") as fh:
        json.dump({"updates_per_phase": args.updates,
                   "actor_period": list(period),
                   "explore_ent": args.explore_ent,
                   "anneal_ent": args.anneal_ent,
                   "seeds": rows,
                   "n_covert": sum(r["anneal"]["covert"] for r in rows)},
                  fh, indent=1)
    print(f"report -> {out}")


if __name__ == "__main__":
    main()
