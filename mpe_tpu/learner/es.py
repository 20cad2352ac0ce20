"""Evolution strategies on the fused policy-evaluation kernel.

OpenAI-ES (Salimans et al. 2017) with antithetic sampling and rank
shaping: each generation draws Gaussian perturbation pairs of the
policy, scores every member by rolling out thousands of envs INSIDE the
Pallas kernel (ops/fused_policy.fused_policy_rollout: obs -> MLP on the
MXU -> Gumbel-max sample -> physics, state resident in VMEM), and
ascends the rank-weighted score gradient. The whole generation — a
``lax.scan`` over the stacked member parameters around the kernel — is
ONE jit dispatch, so the tunnel's fixed per-dispatch cost amortizes
over the entire population. Common random numbers (the same kernel
seed for every member of a generation) cancel environment luck out of
the member comparison.

Convergence on ``simple`` is pinned by
tests/test_fused.py::test_es_learns_simple; the CLI wrapper is
examples/es_train.py. The reference repo has no learners at all —
this is net-new TPU machinery (population search being the workload
the policy-EVAL kernel exists for).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def build_es_step(kscn, params, n_envs, n_steps, horizon, pop, sigma, lr,
                  interpret: bool = False):
    """-> jitted ``step(params, gen) -> (params, mean_score)``; one
    generation of antithetic OpenAI-ES with rank shaping. ``pop`` counts
    the +/- pair members (must be even); ``params`` is a
    learner.init_policy pytree (shapes only at build time)."""
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
