"""Fused-kernel component ablation on the real chip: where does a
scenario's step time go?

For a scenario, times the fused rollout with

  - full        : the shipping kernel
  - no_rewobs   : reward/obs assembly replaced by cheap zeros (physics +
                  RNG + reset remain)
  - no_physics  : physics replaced by identity (reward/obs + RNG remain)
  - mxu / unrolled : the MXU-packed pair physics (ops/mxu_physics) vs
                  the unrolled generic_physics_block, full kernel

The per-component marginal costs back the roofline analysis in PERF.md
(the ablated kernels compute garbage — this tool is for timing only).

    python tools/kernel_ablate.py [--scenario simple_world_comm]
        [--n-envs 4096] [--n-steps 10000] [--repeats 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp


def build_variants(name):
    from mpe_tpu.ops.kernel_scenarios import (
        generic_physics_block, kernel_scenario)
    from mpe_tpu.ops.mxu_physics import mxu_physics_block

    base = kernel_scenario(name)
    cls = type(base)

    class NoRewObs(cls):
        def reward_obs(self, pos, vel, comm=None, goal=None, prep=None):
            # keep the real [A, OW, N] obs shape: a [1, 1, N] stub's
            # leading-axis reduce crashes the Mosaic layout pass
            n = pos.shape[-1]
            return (jnp.zeros((self.reward_rows, n), pos.dtype),
                    jnp.zeros((self.spec.n_agents, self.obs_w, n),
                              pos.dtype))

    class NoPhysics(cls):
        def physics(self, pos, vel, move, prep=None):
            return pos, vel

    class Unrolled(cls):
        def physics(self, pos, vel, move, prep=None):
            return generic_physics_block(self.spec, pos, vel, move)

    class Mxu(cls):
        MIN_MXU_PAIRS = 1

        def physics(self, pos, vel, move, prep=None):
            return mxu_physics_block(self.spec, pos, vel, move,
                                     min_pairs=1,
                                     prep=None if prep is None
                                     else prep.get("phys"))

    out = {"full": base, "no_rewobs": NoRewObs(base.spec),
           "no_physics": NoPhysics(base.spec),
           "unrolled_physics": Unrolled(base.spec),
           "mxu_physics": Mxu(base.spec)}
    if getattr(cls, "MXU_OBS", None) is not None:
        class RowObs(cls):
            MXU_OBS = False

        class MxuObs(cls):
            MXU_OBS = True

        out["rowwise_obs"] = RowObs(base.spec)
        out["mxu_obs"] = MxuObs(base.spec)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenario", default="simple_world_comm")
    ap.add_argument("--n-envs", type=int, default=4096)
    ap.add_argument("--n-steps", type=int, default=10000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--variants", default=None,
                    help="comma-separated subset (crash isolation: a "
                         "Mosaic compiler abort kills the whole process)")
    args = ap.parse_args()

    from mpe_tpu.ops.fused_rollout import fused_rollout

    report = {"scenario": args.scenario, "n_envs": args.n_envs,
              "n_steps": args.n_steps, "variants": {}}
    steps = args.n_envs * args.n_steps
    variants = build_variants(args.scenario)
    if args.variants:
        keep = [k.strip() for k in args.variants.split(",")]
        unknown = set(keep) - set(variants)
        if unknown:
            raise SystemExit(
                f"unknown variants {sorted(unknown)}; "
                f"available: {sorted(variants)}")
        variants = {k: v for k, v in variants.items() if k in keep}
    for name, kscn in variants.items():
        run = fused_rollout(kscn, n_envs=args.n_envs, n_steps=args.n_steps)

        def go(seed):
            out = run(seed)
            # device->host sync (block_until_ready under-reports through
            # the tunnel, CLAUDE.md)
            return float(out[0].ravel()[0])

        go(0)  # compile + warm
        best = 0.0
        for i in range(args.repeats):
            t0 = time.perf_counter()
            go(i + 1)
            best = max(best, steps / (time.perf_counter() - t0))
        report["variants"][name] = best
        print(f"{args.scenario:24s} {name:18s} {best/1e6:8.1f} M steps/s",
              file=sys.stderr, flush=True)

    full = report["variants"].get("full")
    if full:
        for name, v in report["variants"].items():
            if name != "full":
                # marginal cost of the removed component, ns per env-step
                dt = 1e9 * (1.0 / full - 1.0 / v) if v else float("nan")
                print(f"  {name:18s} marginal {dt:+7.3f} ns/env-step",
                      file=sys.stderr, flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
