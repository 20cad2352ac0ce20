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


def build_es_step(kscn, params, n_envs, n_steps, horizon, pop, sigma, lr,
                  interpret=False):
    """-> jitted ``step(params, gen) -> (params, mean_score)``; one
    generation of antithetic OpenAI-ES with rank shaping. ``pop`` counts
    the +/- pair members (must be even)."""
    import jax
    import jax.numpy as jnp

    from mpe_tpu.ops.fused_policy import fused_policy_rollout

    assert pop % 2 == 0, "antithetic pairs need an even population"
    half = pop // 2
    run = fused_policy_rollout(
        kscn, params, n_envs=n_envs, n_steps=n_steps, horizon=horizon,
        block_envs=min(1024, n_envs), interpret=interpret)

    def score(theta, gen):
        ret, _, eps = run(gen, theta)
        per_lane = ret.sum(0) / jnp.maximum(eps[0], 1.0)
        return per_lane.mean()            # mean return per episode

    @jax.jit
    def step(params, gen):
        key = jax.random.fold_in(jax.random.PRNGKey(17), gen)
        leaves, treedef = jax.tree.flatten(params)
        keys = jax.random.split(key, len(leaves))
        noise = [jax.random.normal(k, (half,) + x.shape, x.dtype)
                 for k, x in zip(keys, leaves)]

        def eval_member(_, member):
            sign, idx = member
            theta = treedef.unflatten([
                x + sign * sigma * n[idx] for x, n in zip(leaves, noise)])
            return 0, score(theta, gen)

        signs = jnp.concatenate([jnp.ones(half), -jnp.ones(half)])
        idxs = jnp.concatenate([jnp.arange(half), jnp.arange(half)])
        _, scores = jax.lax.scan(eval_member, 0, (signs, idxs))

        # rank shaping: scores -> centered uniform weights in [-.5, .5]
        order = jnp.argsort(jnp.argsort(scores))
        w = order.astype(jnp.float32) / (pop - 1) - 0.5
        wplus, wminus = w[:half], w[half:]
        grads = [jnp.tensordot(wplus - wminus, n, axes=1) / (pop * sigma)
                 for n in noise]
        new_leaves = [x + lr * g for x, g in zip(leaves, grads)]
        return treedef.unflatten(new_leaves), scores.mean()

    return step


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
