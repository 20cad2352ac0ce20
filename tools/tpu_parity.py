#!/usr/bin/env python
"""On-chip VALUE parity for every fused Pallas kernel scenario.

tools/tpu_smoke.py checks the production kernels compile and stay
finite on the real TPU; this tool checks their *numbers*. For each
scenario it runs the deterministic fused rollout (Mosaic-compiled, the
exact physics/reward/obs code the production kernels use —
ops/fused_parity.py) and the identical jnp body compiled by regular XLA,
on the same chip, from identical inputs with identical hashed action
streams, and compares every output element-for-element:

  - n_steps=1: tight bound (single-step lowering parity, no dynamical
    amplification);
  - n_steps=64: looser bound (collision dynamics are chaotic, so any
    sub-ulp transcendental difference grows; the bound documents the
    measured drift).

Writes tools/tpu_parity_report.json; exit code 0 = all 9 scenarios pass.

    python tools/tpu_parity.py [--n-envs 256] [--block-envs 128]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(1, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

LABELS = ("pos", "vel", "rew_sum", "rew", "obs")
# (n_steps, atol, rtol)
CONFIGS = ((1, 1e-5, 1e-5), (64, 5e-3, 5e-3))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-envs", type=int, default=256)
    ap.add_argument("--block-envs", type=int, default=128)
    ap.add_argument("--scenarios", type=str, default=None,
                    help="comma-separated subset")
    args = ap.parse_args()

    import jax
    import numpy as np

    from mpe_tpu import scenarios as registry
    from mpe_tpu.ops.fused_parity import (
        fused_det_rollout, make_det_inputs, xla_det_rollout_blocked)

    names = (args.scenarios.split(",") if args.scenarios
             else list(registry.names()))
    report = {"device": str(jax.devices()[0]), "n_envs": args.n_envs,
              "block_envs": args.block_envs, "scenarios": {}}
    failures = []

    for name in names:
        inputs = make_det_inputs(name, args.n_envs, seed=11)
        entry = {}
        for n_steps, atol, rtol in CONFIGS:
            t0 = time.perf_counter()
            fused = fused_det_rollout(name, args.n_envs, n_steps,
                                      block_envs=args.block_envs)
            ref = xla_det_rollout_blocked(name, n_steps, args.block_envs)
            f_out = [np.asarray(x) for x in fused(*inputs)]
            r_out = [np.asarray(x) for x in ref(*inputs)]
            diffs, ok = {}, True
            for lbl, a, b in zip(LABELS, f_out, r_out):
                ad = float(np.abs(a - b).max())
                rd = float((np.abs(a - b)
                            / np.maximum(np.abs(b), 1e-6)).max())
                diffs[lbl] = {"max_abs": ad, "max_rel": rd}
                if not (ad <= atol or rd <= rtol):
                    ok = False
            entry[f"steps_{n_steps}"] = {
                "ok": ok, "diffs": diffs, "atol": atol, "rtol": rtol,
                "secs": round(time.perf_counter() - t0, 1)}
            if not ok:
                failures.append(f"{name}@{n_steps}")
            worst = max(d["max_abs"] for d in diffs.values())
            print(f"{name:28s} steps={n_steps:3d} "
                  f"{'OK  ' if ok else 'FAIL'} max|diff|={worst:.3e} "
                  f"({entry[f'steps_{n_steps}']['secs']}s)", flush=True)
        report["scenarios"][name] = entry

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tpu_parity_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"report -> {out}", flush=True)
    if failures:
        print(f"FAILED: {failures}", flush=True)
        sys.exit(1)
    print(f"all {len(names)} scenarios value-parity OK on "
          f"{report['device']}", flush=True)


if __name__ == "__main__":
    main()
