#!/usr/bin/env python
"""Evolution-strategies training on the fused policy-evaluation kernel —
the population-based-search use case of ops/fused_policy.

OpenAI-ES (Salimans et al. 2017): each generation draws antithetic
Gaussian perturbations of the policy, scores every member by rolling out
thousands of envs INSIDE the Pallas kernel (obs -> MLP on the MXU ->
Gumbel-max sample -> physics, state resident in VMEM), and ascends the
rank-weighted score gradient. The whole generation — a ``lax.scan`` over
the stacked member parameters around the kernel — is ONE jit dispatch,
so the ~100 ms tunnel round trip amortizes over the entire population.
Common random numbers (same kernel seed for all members of a
generation) cancel environment luck out of the member comparison.

    python examples/es_train.py --scenario simple --gens 30
    python examples/es_train.py --scenario simple_spread --pop 32 \
        --n-envs 2048 --gens 100
"""
import argparse
import os
import sys

sys.path.insert(1, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenario", default="simple")
    ap.add_argument("--gens", type=int, default=30)
    ap.add_argument("--pop", type=int, default=16)
    ap.add_argument("--sigma", type=float, default=0.05)
    ap.add_argument("--lr", type=float, default=0.03)
    ap.add_argument("--n-envs", type=int, default=1024)
    ap.add_argument("--n-steps", type=int, default=100)
    ap.add_argument("--horizon", type=int, default=25)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--save", default=None, metavar="PATH")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax

    from mpe_tpu.learner import init_policy
    from mpe_tpu.learner.es import build_es_step
    from mpe_tpu.ops.kernel_scenarios import kernel_scenario

    k = kernel_scenario(args.scenario)
    dim_c = k.spec.dim_c if k.uses_comm else 0
    params = init_policy(jax.random.PRNGKey(0), k.obs_w, 5 + dim_c,
                         hidden=args.hidden)
    step = build_es_step(k, params, args.n_envs, args.n_steps,
                         args.horizon, args.pop, args.sigma, args.lr,
                         interpret=args.interpret)
    for g in range(args.gens):
        params, mean_score = step(params, g)
        if g % 5 == 0 or g == args.gens - 1:
            print(f"gen {g:4d}  mean return/episode {float(mean_score):+.3f}",
                  flush=True)
    if args.save:
        from mpe_tpu.utils.checkpoint import save_checkpoint

        save_checkpoint(args.save, params, step=args.gens)
        print(f"saved params -> {args.save}")


if __name__ == "__main__":
    main()
