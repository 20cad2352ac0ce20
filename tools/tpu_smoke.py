#!/usr/bin/env python
"""Compile + run every fused Pallas kernel on the real TPU chip.

Run after touching ops/ (tests force CPU, so Mosaic lowering regressions
only surface here). Uses small step counts; the remote compile cache
makes re-runs cheap. Exit code 0 = all kernels compile and produce
finite outputs.

    python tools/tpu_smoke.py [--steps 200]
"""
import argparse
import os
import sys
import time

sys.path.insert(1, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--n-envs", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import numpy as np

    from mpe_tpu import scenarios as registry
    from mpe_tpu.learner import init_policy
    from mpe_tpu.ops.fused_policy import fused_policy_rollout
    from mpe_tpu.ops.fused_rollout import fused_rollout
    from mpe_tpu.ops.fused_trajectory import fused_trajectory
    from mpe_tpu.ops.kernel_scenarios import kernel_scenario

    failures = []

    def check(name, fn):
        t0 = time.perf_counter()
        try:
            out = fn()
            ok = all(np.isfinite(np.asarray(x)).all() for x in out)
            status = "OK" if ok else "NON-FINITE"
            if not ok:
                failures.append(name)
        except Exception as e:
            status = f"FAIL {type(e).__name__}: {e}"
            failures.append(name)
        print(f"{name:45s} {status}  ({time.perf_counter()-t0:.0f}s)",
              flush=True)

    ne, ns = args.n_envs, args.steps
    for scen in registry.names():
        check(f"fused_rollout[{scen}]",
              lambda s=scen: fused_rollout(
                  s, n_envs=ne, n_steps=ns, horizon=100,
                  block_envs=1024)(0))
    check("fused_trajectory[simple_spread]",
          lambda: fused_trajectory("simple_spread", n_envs=ne,
                                   n_steps=min(ns, 64), horizon=20,
                                   block_envs=1024, t_chunk=8)(0))
    check("fused_trajectory[simple_reference]",
          lambda: fused_trajectory("simple_reference", n_envs=ne,
                                   n_steps=min(ns, 64), horizon=20,
                                   block_envs=1024, t_chunk=8)(0))
    k = kernel_scenario("simple_spread")
    params = init_policy(jax.random.PRNGKey(0), k.obs_w, 5, hidden=64)
    check("fused_policy[simple_spread]",
          lambda: fused_policy_rollout(
              k, params, n_envs=ne, n_steps=min(ns, 200), horizon=100,
              block_envs=1024)(0, params))
    kr = kernel_scenario("simple_reference")
    pr = init_policy(jax.random.PRNGKey(0), kr.obs_w, 5 + kr.spec.dim_c,
                     hidden=64)
    check("fused_policy[simple_reference]",
          lambda: fused_policy_rollout(
              kr, pr, n_envs=ne, n_steps=min(ns, 200), horizon=100,
              block_envs=1024)(0, pr))

    from mpe_tpu.ops.fused_policy import fused_policy_trajectory

    check("fused_policy_trajectory[simple_spread]",
          lambda: fused_policy_trajectory(
              k, params, n_envs=ne, n_steps=min(ns, 64), horizon=25,
              block_envs=1024, t_chunk=8)(0, params))
    check("fused_policy_trajectory[simple_reference]",
          lambda: fused_policy_trajectory(
              kr, pr, n_envs=ne, n_steps=min(ns, 64), horizon=25,
              block_envs=1024, t_chunk=8)(0, pr))

    from mpe_tpu.learner import init_maddpg
    from mpe_tpu.ops.fused_maddpg import fused_maddpg_trajectory

    md = init_maddpg(jax.random.PRNGKey(0), k.obs_w, 5, k.spec.n_agents)
    check("fused_maddpg_trajectory[simple_spread]",
          lambda: fused_maddpg_trajectory(
              k, md["actor"], n_envs=ne, n_steps=min(ns, 50), horizon=25,
              block_envs=1024, t_chunk=5)(0, md["actor"]))
    ksl = kernel_scenario("simple_speaker_listener")
    mdc = init_maddpg(jax.random.PRNGKey(0), ksl.obs_w,
                      5 + ksl.spec.dim_c, ksl.spec.n_agents)
    check("fused_maddpg_trajectory[simple_speaker_listener]",
          lambda: fused_maddpg_trajectory(
              ksl, mdc["actor"], n_envs=ne, n_steps=min(ns, 50),
              horizon=25, block_envs=1024, t_chunk=5)(0, mdc["actor"]))
    # rows mode (the collect path's in-kernel [W, N] -> [N, W]
    # transpose lowering)
    check("fused_maddpg_trajectory[rows, simple_spread]",
          lambda: fused_maddpg_trajectory(
              k, md["actor"], n_envs=ne, n_steps=min(ns, 50), horizon=25,
              block_envs=1024, t_chunk=5,
              emit_rows=True)(0, md["actor"]))

    # the in-kernel learner updates (full fused PPO / MAPPO iteration:
    # rollout kernel + update kernel + optax, on a comm scenario too so
    # the comm-head gradient path lowers)
    from jax.sharding import Mesh

    from mpe_tpu.learner import build_fused_mappo_step, build_fused_ppo_step

    mesh = Mesh(np.array([jax.devices()[0]]), ("env",))
    for nm, builder in (("fused_ppo_step", build_fused_ppo_step),
                        ("fused_mappo_step", build_fused_mappo_step)):
        for scen in ("simple_spread", "simple_reference"):
            def run(b=builder, s=scen):
                step = b(s, mesh, n_envs=1024, n_steps=16, horizon=16,
                         hidden=64, block_envs=512, t_chunk=8)
                state, m = step(step.init_state(
                    step.init_params(jax.random.PRNGKey(0))), 0)
                return tuple(m.values())
            check(f"{nm}[{scen}]", run)

    if failures:
        print(f"FAILED: {failures}", flush=True)
        sys.exit(1)
    print("all fused kernels OK on", jax.devices()[0], flush=True)


if __name__ == "__main__":
    main()
