#!/usr/bin/env python
"""Policy evaluation at full fused-kernel speed: env + MLP inference +
Gumbel-max sampling in one Pallas kernel (TPU; --interpret elsewhere).

    python examples/evaluate_policy.py --scenario simple_tag --n-envs 4096

Evaluate a policy trained by train.py (REINFORCE head — the architecture
the fused kernel runs) instead of a random-init one:

    python examples/train.py --scenario simple --iters 150 --save /tmp/p.npz
    python examples/evaluate_policy.py --scenario simple --load /tmp/p.npz
"""
import argparse
import os
import sys

sys.path.insert(1, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenario", default="simple_spread")
    ap.add_argument("--n-envs", type=int, default=1024)
    ap.add_argument("--n-steps", type=int, default=500)
    ap.add_argument("--horizon", type=int, default=100)
    ap.add_argument("--hidden", type=int, default=64,
                    help="MLP width (must match the checkpoint's)")
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--load", default=None, metavar="PATH",
                    help="npz checkpoint from train.py --algo reinforce "
                         "--save (must match this scenario's obs/action "
                         "widths)")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import numpy as np

    from mpe_tpu.learner import init_policy
    from mpe_tpu.ops.fused_policy import fused_policy_rollout
    from mpe_tpu.ops.kernel_scenarios import kernel_scenario

    k = kernel_scenario(args.scenario)
    dim_c = k.spec.dim_c if k.uses_comm else 0
    params = init_policy(jax.random.PRNGKey(0), k.obs_w, 5 + dim_c,
                         hidden=args.hidden)
    if args.load:
        from mpe_tpu.utils.checkpoint import load_checkpoint

        # load_checkpoint's template must mirror the saved {'state': ...}
        # payload structure (see utils/checkpoint.py contract).
        payload, step, _ = load_checkpoint(args.load, {"state": params})
        loaded = payload["state"]
        for name, layer in params.items():   # width compatibility check
            assert loaded[name]["w"].shape == layer["w"].shape, (
                f"checkpoint layer {name!r}: {loaded[name]['w'].shape} vs "
                f"expected {layer['w'].shape} — trained on a different "
                f"scenario or a non-REINFORCE head?")
        params = jax.tree.map(lambda x: x.astype(jax.numpy.float32), loaded)
        print(f"loaded {args.load} (trained {step} iters)")
    run = fused_policy_rollout(
        k, params, n_envs=args.n_envs, n_steps=args.n_steps,
        horizon=args.horizon,
        block_envs=min(1024, args.n_envs), interpret=args.interpret)
    ret, pos, eps = run(0, params)
    per_ep = np.asarray(ret).sum(0) / np.maximum(np.asarray(eps)[0], 1)
    print(f"{args.scenario}: mean return/episode "
          f"{per_ep.mean():+.2f} ± {per_ep.std():.2f} over "
          f"{int(np.asarray(eps).sum())} episodes")


if __name__ == "__main__":
    main()
