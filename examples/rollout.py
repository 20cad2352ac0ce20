#!/usr/bin/env python
"""Batched rollout demo: XLA scan engine vs fused Pallas engine.

    python examples/rollout.py --scenario simple_spread --n-envs 4096
"""
import argparse
import os
import sys

sys.path.insert(1, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenario", default="simple_spread")
    ap.add_argument("--n-envs", type=int, default=4096)
    ap.add_argument("--n-steps", type=int, default=1000)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--fused", action="store_true",
                    help="use the fused Pallas engine (TPU only)")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax

    from mpe_tpu import scenarios
    from mpe_tpu.envs import MpeEnv
    from mpe_tpu.parallel import build_rollout

    if args.fused:
        from mpe_tpu.ops import fused_rollout

        run = fused_rollout(args.scenario, args.n_envs, args.n_steps,
                            horizon=100, block_envs=min(1024, args.n_envs))
        float(run(0)[2].sum())  # compile
        t0 = time.perf_counter()
        rew = float(run(1)[2].sum())
        dt = time.perf_counter() - t0
    else:
        env = MpeEnv(scenarios.load(args.scenario), max_steps=100,
                     auto_reset=True)
        rollout = build_rollout(env, args.n_envs, args.n_steps, env_axis=-1)
        key = jax.random.PRNGKey(0)
        float(rollout(key)[1])  # compile
        t0 = time.perf_counter()
        rew = float(rollout(jax.random.fold_in(key, 1))[1])
        dt = time.perf_counter() - t0
    steps = args.n_envs * args.n_steps
    print(f"{args.scenario}: {steps/dt/1e6:.1f} M env-steps/s "
          f"(reward sum {rew:.1f})")


if __name__ == "__main__":
    main()
