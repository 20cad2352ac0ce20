"""MADDPG loop phase ablation on the real chip: where does a
transition's time go?

The off-policy loop (tools/train_bench.py bench_maddpg) interleaves
collection and updates at 1 update per ``n_envs`` transitions. This tool
times each phase separately with everything scanned on-device (the
tunnel's fixed 30-100 ms dispatch would otherwise dominate — CLAUDE.md):

  - collect_kernel : the ops/fused_maddpg trajectory kernel alone
                     (outputs consumed on-device by a sum)
  - collect_chunk  : kernel + rowize transpose + ring insert
                     (learner.build_fused_collect)
  - xla_collect    : learner.build_maddpg's per-step collect_fn
  - update         : learner update_fn alone (critic + actor + polyak),
                     scanned over a fixed buffer
  - fused_update   : the single-kernel analytic-gradient update
                     (learner.maddpg.build_fused_update) when available

Writes tools/maddpg_ablate_report.json; numbers feed PERF.md's MADDPG
roofline section.

    python tools/maddpg_ablate.py [--phases collect_kernel,update,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N_ENVS = 1024
HORIZON = 25
CHUNKS = 200          # timed chunks per run (matches train_bench)
CAP_CHUNKS = 10
BATCH = 1024


def _sync(x):
    return float(jnp.asarray(x).ravel()[0])


def _time(fn, *args, repeats=3):
    """Compile, then best-of-N wall time of fn(*args) with a forced sync."""
    out = fn(*args)
    _sync(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phases", default=None)
    args = ap.parse_args()
    only = set(args.phases.split(",")) if args.phases else None

    from mpe_tpu import scenarios
    from mpe_tpu.envs import MpeEnv
    from mpe_tpu.learner import (build_fused_collect, build_maddpg,
                                 init_buffer, init_maddpg)
    from mpe_tpu.learner.maddpg import maddpg_act_dim
    from mpe_tpu.ops.fused_maddpg import fused_maddpg_trajectory
    from mpe_tpu.ops.kernel_scenarios import kernel_scenario

    env = MpeEnv(scenarios.load("simple_spread"), max_steps=HORIZON,
                 auto_reset=True)
    kscn = kernel_scenario(env.scenario)
    aw = maddpg_act_dim(env)
    obs_dim = env.scenario.obs_width
    capacity = CAP_CHUNKS * HORIZON * N_ENVS
    transitions = CHUNKS * HORIZON * N_ENVS

    params = init_maddpg(jax.random.PRNGKey(0), obs_dim, aw, env.n_agents)
    targets = jax.tree.map(lambda x: x, params)
    reset_fn, collect_fn, update_fn, init_opt = build_maddpg(
        env, n_envs=N_ENVS, capacity=capacity, batch=BATCH)
    opt_states = init_opt(params)
    buffer = init_buffer(capacity, env.n_agents, obs_dim, aw)

    # the tunnel's fixed per-dispatch floor (~30 ms regardless of the
    # scanned iteration count — CLAUDE.md) would otherwise be charged to
    # short phases; measure it with a trivial scanned program and
    # subtract it from every phase
    @jax.jit
    def _noop(x):
        return jax.lax.scan(lambda c, i: (c + 1e-30, None), x,
                            jnp.arange(CHUNKS, dtype=jnp.int32))[0]

    floor = _time(_noop, jnp.float32(0))
    print(f"dispatch floor: {floor*1e3:.1f} ms (subtracted per phase)",
          file=sys.stderr, flush=True)

    report = {"n_envs": N_ENVS, "horizon": HORIZON, "chunks": CHUNKS,
              "transitions": transitions, "dispatch_floor_s": floor,
              "phases": {}}

    def record(name, seconds, n=transitions):
        corr = max(seconds - floor, 1e-9)
        report["phases"][name] = {
            "s": seconds, "s_minus_floor": corr, "steps_s": n / corr,
            "ns_per_transition": 1e9 * corr / n}
        print(f"{name:16s} {n/corr/1e6:8.2f} M steps/s   "
              f"{1e9*corr/n:8.1f} ns/transition  (raw {seconds*1e3:.0f} ms)",
              file=sys.stderr, flush=True)

    def want(name):
        return only is None or name in only

    # --- collect kernel alone -------------------------------------------
    if want("collect_kernel"):
        traj = fused_maddpg_trajectory(
            kscn, jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                params["actor"]),
            n_envs=N_ENVS, n_steps=HORIZON, horizon=HORIZON, t_chunk=5)

        @jax.jit
        def collect_only(actor_params):
            def body(acc, i):
                obs, act, rew, obs2 = traj(i, actor_params)
                return acc + rew.sum() + obs2.sum(), None
            return jax.lax.scan(body, 0.0,
                                jnp.arange(CHUNKS, dtype=jnp.int32))[0]

        record("collect_kernel", _time(collect_only, params["actor"]))

    # --- collect chunk (kernel + rowize + insert) ------------------------
    if want("collect_chunk"):
        collect = build_fused_collect(env, n_envs=N_ENVS, n_steps=HORIZON,
                                      t_chunk=5)

        @jax.jit
        def chunk_only(actor_params, buf):
            def body(b, i):
                b, mr = collect(actor_params, b, i)
                return b, mr
            buf, mrs = jax.lax.scan(body, buf,
                                    jnp.arange(CHUNKS, dtype=jnp.int32))
            return mrs[-1]

        record("collect_chunk", _time(chunk_only, params["actor"], buffer))

    # --- xla per-step collect --------------------------------------------
    if want("xla_collect"):
        states, obs = reset_fn(jax.random.PRNGKey(1))

        @jax.jit
        def xla_collect(p, states, obs, buf):
            def body(c, k):
                st, ob, b = c
                st, ob, b, mr = collect_fn(p, st, ob, b, k)
                return (st, ob, b), mr
            (_, _, buf), mrs = jax.lax.scan(
                body, (states, obs, buf),
                jax.random.split(jax.random.PRNGKey(3), CHUNKS * HORIZON))
            return mrs[-1]

        record("xla_collect", _time(xla_collect, params, states, obs,
                                    buffer))

    # --- updates alone (fixed full buffer) --------------------------------
    n_updates = CHUNKS * HORIZON
    full = buffer._replace(size=jnp.int32(capacity))

    def updates_only_of(upd):
        @jax.jit
        def updates_only(p, t, o, buf):
            def body(c, k):
                p, t, o = c
                p, t, o, m = upd(p, t, o, buf, k, True)
                return (p, t, o), m["q"]
            (_, _, _), qs = jax.lax.scan(
                body, (p, t, o),
                jax.random.split(jax.random.PRNGKey(5), n_updates))
            return qs[-1]
        return updates_only

    if want("update"):
        record("update", _time(updates_only_of(update_fn), params, targets,
                               opt_states, full))

    if want("fused_update"):
        try:
            from mpe_tpu.learner.maddpg import build_fused_update
        except ImportError:
            build_fused_update = None
        if build_fused_update is not None:
            fupd = build_fused_update(env, batch=BATCH)
            record("fused_update", _time(updates_only_of(fupd), params,
                                         targets, opt_states, full))

    # --- the production contest: chunk trainer (pre-gathered batches),
    # XLA op-chain gradient vs the single-kernel analytic gradient ------
    def chunk_updates_of(engine):
        from mpe_tpu.learner.maddpg import build_fused_update_chunk

        upd = build_fused_update_chunk(env, HORIZON, batch=BATCH,
                                       grad_engine=engine)
        opt = upd.init_opt(params)

        @jax.jit
        def run(p, t, o, buf):
            def body(c, k):
                p, t, o = c
                p, t, o, m = upd(p, t, o, buf, k,
                                 jnp.ones((HORIZON,), bool))
                return (p, t, o), m["q"]
            (_, _, _), qs = jax.lax.scan(
                body, (p, t, o),
                jax.random.split(jax.random.PRNGKey(5),
                                 n_updates // HORIZON))
            return qs[-1]

        return run, opt

    for engine in ("xla", "kernel"):
        if want(f"chunk_update_{engine}"):
            run, opt = chunk_updates_of(engine)
            record(f"chunk_update_{engine}",
                   _time(run, params, targets, opt, full))

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "maddpg_ablate_report.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report["phases"]))


if __name__ == "__main__":
    main()
