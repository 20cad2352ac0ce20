"""End-to-end TRAINING throughput on the real TPU chip: the XLA-scan
PPO loop (learner/ppo.py, rollout = scan of vmapped env steps) vs the
fused-kernel PPO loop (learner/fused_ppo.py, rollout collected inside
one Pallas kernel) on simple_spread, identical hyperparameters.

Each learner is measured two ways:
  - per-call: one jitted iteration per host dispatch (how a training
    script with per-iter logging runs). Through the axon tunnel each
    dispatch costs a fixed ~30-100 ms round trip, which dominates fast
    iterations;
  - scanned: ``lax.scan`` over ITERS iterations inside one jit — the
    production shape for long training runs, and the true device
    throughput.

Timing per CLAUDE.md: a float() device->host sync bounds every region
(block_until_ready under-reports through the tunnel).

Writes tools/train_bench_report.json; prints a summary table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

N_ENVS = 4096
N_STEPS = 64
HORIZON = 32
ITERS = 30
HP = dict(lr=3e-4, gamma=0.95, lam=0.95, clip=0.2, vf_coef=0.5,
          ent_coef=0.01, ppo_epochs=4)


def _sync(x):
    return float(jnp.asarray(x).ravel()[0])


def _time_calls(fn, args_list):
    """Run fn over args_list sequentially, sync at the end; -> seconds."""
    t0 = time.time()
    out = None
    for a in args_list:
        out = fn(*a)
    _sync(jax.tree.leaves(out)[0])
    return time.time() - t0


def bench_xla_ppo(mesh):
    from mpe_tpu import scenarios
    from mpe_tpu.envs import MpeEnv
    from mpe_tpu.learner import build_ppo_step, init_ac

    env = MpeEnv(scenarios.load("simple_spread"))
    step = build_ppo_step(env, mesh, n_envs=N_ENVS, n_steps=N_STEPS, **HP)
    params = init_ac(jax.random.PRNGKey(0), 18, 5)
    state = step.init_state(params)
    keys = [jax.random.PRNGKey(i) for i in range(ITERS)]

    state, m = step(state, keys[0])          # compile
    _sync(m["loss"])

    def percall(st):
        return _time_calls(lambda k: step(st, k)[0], [(k,) for k in keys])

    @jax.jit
    def scanned(st, key):
        def body(s, k):
            s, m = step(s, k)
            return s, m["loss"]
        return jax.lax.scan(body, st, jax.random.split(key, ITERS))

    s2, losses = scanned(state, jax.random.PRNGKey(99))   # compile
    _sync(losses[-1])
    t0 = time.time()
    s2, losses = scanned(state, jax.random.PRNGKey(98))
    _sync(losses[-1])
    dt_scan = time.time() - t0
    return {"per_call_s": percall(state), "scanned_s": dt_scan,
            "mean_reward": float(m["mean_reward"])}


def bench_fused_ppo(mesh, builder_name="build_fused_ppo_step"):
    import mpe_tpu.learner as L

    builder = getattr(L, builder_name)
    step = builder("simple_spread", mesh, n_envs=N_ENVS, n_steps=N_STEPS,
                   horizon=HORIZON, block_envs=1024, t_chunk=8, **HP)
    params = step.init_params(jax.random.PRNGKey(0))
    state = step.init_state(params)

    state, m = step(state, 0)                # compile
    _sync(m["loss"])

    percall = _time_calls(lambda i: step(state, i)[0],
                          [(i,) for i in range(ITERS)])

    @jax.jit
    def scanned(st, seed0):
        def body(s, i):
            s, m = step(s, seed0 + i)
            return s, m["loss"]
        return jax.lax.scan(body, st, jnp.arange(ITERS, dtype=jnp.int32))

    s2, losses = scanned(state, jnp.int32(100))   # compile
    _sync(losses[-1])
    t0 = time.time()
    s2, losses = scanned(state, jnp.int32(200))
    _sync(losses[-1])
    dt_scan = time.time() - t0
    return {"per_call_s": percall, "scanned_s": dt_scan,
            "mean_reward": float(m["mean_reward"])}


def main():
    dev = jax.devices()[0]
    mesh = Mesh(np.array([dev]), ("env",))
    transitions = N_ENVS * N_STEPS * ITERS

    print(f"device: {dev.device_kind}; {N_ENVS} envs x {N_STEPS} steps "
          f"x {ITERS} iters = {transitions/1e6:.1f}M transitions/run",
          file=sys.stderr, flush=True)

    report = {"device": dev.device_kind, "n_envs": N_ENVS,
              "n_steps": N_STEPS, "iters": ITERS, "hp": HP,
              "loops": {}}
    for name, fn in (("xla_ppo", bench_xla_ppo),
                     ("fused_ppo", bench_fused_ppo),
                     ("fused_mappo", lambda m: bench_fused_ppo(
                         m, "build_fused_mappo_step"))):
        r = fn(mesh)
        r["per_call_steps_s"] = transitions / r["per_call_s"]
        r["scanned_steps_s"] = transitions / r["scanned_s"]
        report["loops"][name] = r
        print(f"{name:10s}  per-call {r['per_call_steps_s']/1e6:8.1f}M "
              f"steps/s   scanned {r['scanned_steps_s']/1e6:8.1f}M steps/s",
              file=sys.stderr, flush=True)

    x, f = report["loops"]["xla_ppo"], report["loops"]["fused_ppo"]
    report["speedup_per_call"] = (
        f["per_call_steps_s"] / x["per_call_steps_s"])
    report["speedup_scanned"] = f["scanned_steps_s"] / x["scanned_steps_s"]
    print(f"fused/xla speedup: per-call {report['speedup_per_call']:.1f}x, "
          f"scanned {report['speedup_scanned']:.1f}x",
          file=sys.stderr, flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "train_bench_report.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({"metric": "fused-PPO training env-steps/s (scanned)",
                      "value": f["scanned_steps_s"],
                      "unit": "env-steps/s",
                      "vs_xla_loop": report["speedup_scanned"]}))


if __name__ == "__main__":
    main()
