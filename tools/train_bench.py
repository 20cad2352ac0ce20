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


MD_ENVS = 1024       # maddpg replay envs
MD_HORIZON = 25
MD_CHUNKS = 200      # timed fused chunks; xla runs MD_CHUNKS*MD_HORIZON iters
MD_CAP_CHUNKS = 10   # ring capacity in chunks (the ring wraps while timing:
                     # chunk inserts stay aligned, so the contiguous fast
                     # path is what's measured). MD_CHUNKS=200 puts ~0.1s+ of
                     # work behind one dispatch even for the fused loop —
                     # the tunnel's fixed ~30 ms round-trip floor (measured:
                     # a trivial scanned program costs ~30 ms regardless of
                     # iteration count) would otherwise eat ~50% of it.


def bench_maddpg(fused: bool, n_envs: int = MD_ENVS,
                 chunks: int = MD_CHUNKS):
    """MADDPG off-policy loop: collection + updates at the per-step
    loop's 1-update-per-(n_envs transitions) ratio. xla collects ONE
    env step per iteration (learner/maddpg.collect_fn) and updates with
    the XLA op-chain update_fn; fused collects a horizon chunk per
    iteration via the per-agent Pallas kernel (ops/fused_maddpg) then
    runs `horizon` updates on pre-gathered batches
    (build_fused_update_chunk, default grad engine). Equal transition
    counts either way: chunks * MD_HORIZON * n_envs."""
    from mpe_tpu import scenarios
    from mpe_tpu.envs import MpeEnv
    from mpe_tpu.learner import (build_fused_collect,
                                 build_fused_update_chunk, build_maddpg,
                                 init_buffer, init_maddpg)

    env = MpeEnv(scenarios.load("simple_spread"), max_steps=MD_HORIZON,
                 auto_reset=True)
    mw = 2 * env.spec.dim_p + 1
    capacity = MD_CAP_CHUNKS * MD_HORIZON * n_envs
    params = init_maddpg(jax.random.PRNGKey(0), env.scenario.obs_width, mw,
                         env.n_agents)
    targets = jax.tree.map(lambda x: x, params)
    reset_fn, collect_fn, update_fn, init_opt = build_maddpg(
        env, n_envs=n_envs, capacity=capacity, batch=1024)
    opt_states = init_opt(params)
    buffer = init_buffer(capacity, env.n_agents, env.scenario.obs_width, mw)

    if fused:
        collect = build_fused_collect(env, n_envs=n_envs,
                                      n_steps=MD_HORIZON, t_chunk=5)
        update_chunk = build_fused_update_chunk(env, MD_HORIZON,
                                                batch=1024)
        gates = jnp.ones((MD_HORIZON,), bool)

        # persistent-packed carry wins at <=1024 envs (32.2 vs 31.0M,
        # same-process A/B) but LOSES at 4096 (55 vs 60M) — some XLA
        # layout/copy interaction between the packed while-loop carry
        # and the 4x-larger replay buffer that per-phase isolation
        # doesn't reproduce; use the measured-faster form per config
        packed_carry = n_envs <= 1024

        @jax.jit
        def iteration(carry, i):
            if packed_carry:
                pstate, buffer = carry
                buffer, mr = collect(update_chunk.actor_of(pstate),
                                     buffer, i)
                pstate, _ = update_chunk.packed_step(
                    pstate, buffer,
                    jax.random.fold_in(jax.random.PRNGKey(7), i), gates)
                return (pstate, buffer), mr
            params, targets, opt_states, buffer = carry
            buffer, mr = collect(params["actor"], buffer, i)
            params, targets, opt_states, _ = update_chunk(
                params, targets, opt_states, buffer,
                jax.random.fold_in(jax.random.PRNGKey(7), i), gates)
            return (params, targets, opt_states, buffer), mr

        @jax.jit
        def scanned(carry):
            return jax.lax.scan(iteration, carry,
                                jnp.arange(chunks, dtype=jnp.int32))

        carry = ((update_chunk.pack_state(params, targets, opt_states),
                  buffer) if packed_carry
                 else (params, targets, opt_states, buffer))
        c2, mrs = scanned(carry)          # compile
        _sync(mrs[-1])
        t0 = time.time()
        c2, mrs = scanned(carry)
        _sync(mrs[-1])
        return {"scanned_s": time.time() - t0}

    states, obs = reset_fn(jax.random.PRNGKey(1))

    @jax.jit
    def iteration(carry, k):
        params, targets, opt_states, states, obs, buffer = carry
        k1, k2 = jax.random.split(k)
        states, obs, buffer, mr = collect_fn(params, states, obs, buffer, k1)
        params, targets, opt_states, _ = update_fn(
            params, targets, opt_states, buffer, k2, True)
        return (params, targets, opt_states, states, obs, buffer), mr

    @jax.jit
    def scanned(carry):
        return jax.lax.scan(
            iteration, carry,
            jax.random.split(jax.random.PRNGKey(3),
                             chunks * MD_HORIZON))

    carry = (params, targets, opt_states, states, obs, buffer)
    c2, mrs = scanned(carry)              # compile
    _sync(mrs[-1])
    t0 = time.time()
    c2, mrs = scanned(carry)
    _sync(mrs[-1])
    return {"scanned_s": time.time() - t0}


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma-separated row subset (xla_ppo, fused_ppo, "
                         "fused_mappo, xla_maddpg, fused_maddpg); merges "
                         "into the existing report")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    dev = jax.devices()[0]
    mesh = Mesh(np.array([dev]), ("env",))
    transitions = N_ENVS * N_STEPS * ITERS

    print(f"device: {dev.device_kind}; {N_ENVS} envs x {N_STEPS} steps "
          f"x {ITERS} iters = {transitions/1e6:.1f}M transitions/run",
          file=sys.stderr, flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "train_bench_report.json")
    report = {"device": dev.device_kind, "n_envs": N_ENVS,
              "n_steps": N_STEPS, "iters": ITERS, "hp": HP,
              "loops": {}}
    if only and os.path.exists(out):      # merge partial runs
        with open(out) as fh:
            report = json.load(fh)
        report.setdefault("loops", {})

    for name, fn in (("xla_ppo", bench_xla_ppo),
                     ("fused_ppo", bench_fused_ppo),
                     ("fused_mappo", lambda m: bench_fused_ppo(
                         m, "build_fused_mappo_step"))):
        if only and name not in only:
            continue
        r = fn(mesh)
        r["per_call_steps_s"] = transitions / r["per_call_s"]
        r["scanned_steps_s"] = transitions / r["scanned_s"]
        report["loops"][name] = r
        print(f"{name:10s}  per-call {r['per_call_steps_s']/1e6:8.1f}M "
              f"steps/s   scanned {r['scanned_steps_s']/1e6:8.1f}M steps/s",
              file=sys.stderr, flush=True)

    if {"xla_ppo", "fused_ppo"} <= set(report["loops"]):
        x, f = report["loops"]["xla_ppo"], report["loops"]["fused_ppo"]
        report["speedup_per_call"] = (
            f["per_call_steps_s"] / x["per_call_steps_s"])
        report["speedup_scanned"] = (
            f["scanned_steps_s"] / x["scanned_steps_s"])
        print(f"fused/xla speedup: per-call "
              f"{report['speedup_per_call']:.1f}x, "
              f"scanned {report['speedup_scanned']:.1f}x",
              file=sys.stderr, flush=True)

    md_transitions = MD_CHUNKS * MD_HORIZON * MD_ENVS
    md = report["maddpg"] = {
        "n_envs": MD_ENVS, "horizon": MD_HORIZON,
        "transitions": md_transitions,
        "loops": (report.get("maddpg") or {}).get("loops", {})}
    # second config at 4x the envs: the fused advantage GROWS with env
    # count (the XLA per-step collect is ~flat per transition while the
    # fused collect and the amortized updates shrink)
    rows = (("xla_maddpg", False, MD_ENVS, MD_CHUNKS),
            ("fused_maddpg", True, MD_ENVS, MD_CHUNKS),
            ("xla_maddpg_4k", False, 4 * MD_ENVS, MD_CHUNKS // 4),
            ("fused_maddpg_4k", True, 4 * MD_ENVS, MD_CHUNKS // 4))
    for name, fused, n_envs, chunks in rows:
        if only and name not in only:
            continue
        r = bench_maddpg(fused, n_envs=n_envs, chunks=chunks)
        r["scanned_steps_s"] = (chunks * MD_HORIZON * n_envs
                                / r["scanned_s"])
        md["loops"][name] = r
        print(f"{name:15s}  scanned {r['scanned_steps_s']/1e6:8.2f}M "
              f"steps/s  (collect + 1 update per {n_envs} transitions)",
              file=sys.stderr, flush=True)
    for suffix in ("", "_4k"):
        pair = {f"xla_maddpg{suffix}", f"fused_maddpg{suffix}"}
        if pair <= set(md["loops"]):
            md[f"speedup_scanned{suffix}"] = (
                md["loops"][f"fused_maddpg{suffix}"]["scanned_steps_s"]
                / md["loops"][f"xla_maddpg{suffix}"]["scanned_steps_s"])
            print(f"maddpg{suffix} fused/xla speedup: scanned "
                  f"{md[f'speedup_scanned{suffix}']:.1f}x",
                  file=sys.stderr, flush=True)

    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    f = report["loops"].get("fused_ppo")
    if f:
        print(json.dumps(
            {"metric": "fused-PPO training env-steps/s (scanned)",
             "value": f["scanned_steps_s"],
             "unit": "env-steps/s",
             "vs_xla_loop": report.get("speedup_scanned")}))


if __name__ == "__main__":
    main()
