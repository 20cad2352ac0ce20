#!/usr/bin/env python
"""Per-scenario throughput report: fused Pallas engine + vmapped XLA
engine for every scenario, as JSON. (The driver-facing headline bench is
/root/repo/bench.py; this is the wide regression-tracking run.)

    python benchmarks/run_all.py [--n-envs 4096] [--n-steps 10000] [--out report.json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(1, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def measure(fn, steps):
    fn(0)  # compile + warm
    best = 0.0
    for i in (1, 2):
        t0 = time.perf_counter()
        fn(i)
        best = max(best, steps / (time.perf_counter() - t0))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-envs", type=int, default=4096)
    ap.add_argument("--n-steps", type=int, default=10000)
    ap.add_argument("--xla-steps", type=int, default=2000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--scenarios", default=None,
                    help="comma-separated subset (default: all)")
    args = ap.parse_args()

    import jax

    from mpe_tpu import scenarios
    from mpe_tpu.envs.functional import MpeEnv
    from mpe_tpu.ops.fused_rollout import fused_rollout
    from mpe_tpu.parallel import build_rollout

    report = {"device": str(jax.devices()[0]), "n_envs": args.n_envs,
              "scenarios": {}}
    names = (args.scenarios.split(",") if args.scenarios
             else scenarios.names())
    for name in names:
        row = {}
        run = fused_rollout(name, args.n_envs, args.n_steps, horizon=100)
        row["fused_steps_per_s"] = measure(
            lambda s, run=run: float(run(s)[2].sum()),
            args.n_envs * args.n_steps)
        env = MpeEnv(scenarios.load(name), max_steps=100, auto_reset=True)
        roll = build_rollout(env, args.n_envs, args.xla_steps, env_axis=-1)
        key = jax.random.PRNGKey(0)
        row["xla_steps_per_s"] = measure(
            lambda s, roll=roll, key=key: float(
                roll(jax.random.fold_in(key, s))[1]),
            args.n_envs * args.xla_steps)
        report["scenarios"][name] = {k: round(v, 1) for k, v in row.items()}
        print(f"{name:25s} fused {row['fused_steps_per_s']/1e6:8.1f} M/s   "
              f"xla {row['xla_steps_per_s']/1e6:7.1f} M/s", flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
