#!/usr/bin/env python
"""On-chip VALUE parity for the TRAINING kernels.

tools/tpu_parity.py pins the 9 deterministic *rollout* kernels on
hardware; this tool does the same for the kernels the training
headlines rest on:

  upd_ppo / upd_mappo : fused_ppo_update / fused_mappo_update
      (hand-derived analytic gradients). Two comparisons, both ON THE
      CHIP: (a) ASSERTED — the Mosaic-compiled kernel vs the SAME
      builder with ``interpret=True`` (identical op order, so the diff
      isolates the Mosaic lowering; measured <=2e-6); (b) ASSERTED at
      the loose JAXGRAD_BUDGET (2e-3 · grad scale) vs ``jax.grad`` of the identical XLA loss on the identical batch
      (the CPU tests already pin that math at 1e-9 f64; on hardware the
      clipped-surrogate/argmax INDICATORS flip on sub-ulp boundary ties
      between op orders, each flip moving a weight-grad element by
      O(|x·g|/B) ~ 1e-4, so this bound is loose by construction). The
      loss/batch helpers are loaded from tests/test_fused_update.py.
  upd_maddpg          : ops/fused_maddpg_update, same two comparisons
      (replica losses from tests/test_fused_maddpg_update.py).
  traj_policy / traj_maddpg : the policy-in-the-loop trajectory kernels
      run twice on the chip — Mosaic-compiled with ``hash_rng=True``
      (the deterministic hash PRNG) vs the identical builder with
      ``interpret=True`` (the same jnp body compiled by regular XLA) —
      and compared element-for-element. steps=1 must match tightly on
      every lane; steps=25 reports the fraction of lanes that stay
      identical (discrete Gumbel-max actions can flip on sub-ulp logit
      ties and the flipped lane then diverges, so the bound is a
      match-fraction, not a norm).

Writes tools/tpu_train_parity_report.json; exit 0 = all sections pass.

    python tools/tpu_train_parity.py [--sections upd_ppo,traj_maddpg]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import numpy as np


# ALL NINE scenario configs (r5; r4 ran the 5 hard-shape ones).
# Shape families of note: spread (baseline), speaker_listener (comm,
# heterogeneous obs), reference (dim_c=10 factored comm head), tag
# (heterogeneous widths, 4 agents), world_comm (a*h=384 — the VMEM-guard
# tall-stack path in ops/fused_maddpg_update), crypto (comm-only
# factored heads — the masked-move M=1 Mosaic precision family that has
# bitten twice, CLAUDE.md), simple (1 agent, no comm — the smallest
# stack), adversary/push (competitive closure)
SCENARIOS = ("simple", "simple_spread", "simple_adversary",
             "simple_push", "simple_crypto", "simple_speaker_listener",
             "simple_reference", "simple_tag", "simple_world_comm")

# vs-jax.grad budget: the CPU tests pin interpret==jax.grad at 1e-9 in
# f64; on-chip f32 indicator flips move elements by O(|x*g|/B) ~ 1e-4
# (docstring above), so 2e-3*scale is loose for real drift but tight
# enough to catch a broken lowering
JAXGRAD_BUDGET = 2e-3


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _grad_diffs(got, want):
    flat_w = jax.tree_util.tree_flatten_with_path(want)[0]
    flat_g = dict(jax.tree_util.tree_flatten_with_path(got)[0])
    scale = max(float(jnp.abs(leaf).max()) for _, leaf in flat_w)
    worst_abs = worst_rel = 0.0
    for path, w in flat_w:
        g = np.asarray(flat_g[path], np.float64)
        w = np.asarray(w, np.float64)
        worst_abs = max(worst_abs, float(np.abs(g - w).max()))
        worst_rel = max(worst_rel, float(
            (np.abs(g - w) / np.maximum(np.abs(w), 1e-4 * scale)).max()))
    return worst_abs, worst_rel, scale


def check_upd_ppo(report, mappo: bool):
    from mpe_tpu.ops.fused_update import fused_mappo_update, fused_ppo_update
    from mpe_tpu.ops.kernel_scenarios import kernel_scenario

    tm = _load("tests/test_fused_update.py", "tfu")
    name = "upd_mappo" if mappo else "upd_ppo"
    entry = {}
    for scen in SCENARIOS:
        kscn = kernel_scenario(scen)
        mw = 2 * kscn.spec.dim_p + 1
        dim_c = kscn.spec.dim_c if kscn.uses_comm else 0
        t, n = 8, 256
        if mappo:
            from mpe_tpu.learner.ppo import init_mappo
            params = init_mappo(jax.random.PRNGKey(0), kscn.obs_w,
                                mw + dim_c, kscn.spec.n_agents, hidden=64)
            batch = tm._random_mappo_batch(kscn, params,
                                           jax.random.PRNGKey(1), t, n)
            loss = tm._xla_mappo_loss
            build = lambda **kw: fused_mappo_update(
                kscn, n_envs=n, n_steps=t, hidden=64, clip=tm.CLIP,
                vf_coef=tm.VF, ent_coef=tm.ENTC, block_envs=128,
                t_chunk=4, **kw)
        else:
            from mpe_tpu.learner.ppo import init_ac
            params = init_ac(jax.random.PRNGKey(0), kscn.obs_w,
                             mw + dim_c, hidden=64)
            batch = tm._random_batch(kscn, params, jax.random.PRNGKey(1),
                                     t, n)
            loss = tm._xla_loss
            build = lambda **kw: fused_ppo_update(
                kscn, n_envs=n, n_steps=t, hidden=64, clip=tm.CLIP,
                vf_coef=tm.VF, ent_coef=tm.ENTC, block_envs=128,
                t_chunk=4, **kw)

        obs, mv_oh, cm_oh, logp_old, value_old, adv_n, ret = batch
        args = (params, obs, mv_oh, cm_oh, logp_old, adv_n, ret,
                value_old)
        got, _ = build()(*args)
        twin, _ = build(interpret=True)(*args)
        (_, _), want = jax.value_and_grad(
            lambda p, b: loss(kscn, p, b), has_aux=True)(params, batch)
        ma, mr_, scale = _grad_diffs(got, twin)       # Mosaic lowering
        xa, xr, _ = _grad_diffs(got, want)            # vs jax.grad
        ok = (ma <= 1e-5 * max(scale, 1.0)
              and xa <= JAXGRAD_BUDGET * max(scale, 1.0))
        entry[scen] = {"ok": ok, "mosaic_vs_interpret_abs": ma,
                       "vs_jaxgrad_abs": xa, "vs_jaxgrad_rel": xr,
                       "scale": scale}
        print(f"{name:12s} {scen:26s} {'OK  ' if ok else 'FAIL'} "
              f"mosaic|d|={ma:.3e} jaxgrad|d|={xa:.3e}", flush=True)
    report[name] = entry
    return all(e["ok"] for e in entry.values())


def check_upd_maddpg(report):
    from mpe_tpu.learner.maddpg import init_maddpg
    from mpe_tpu.ops.fused_maddpg_update import fused_maddpg_update

    tm = _load("tests/test_fused_maddpg_update.py", "tfmu")
    entry = {}
    for scen in SCENARIOS:
        obs_dim, a, mw, cw = tm._dims(scen)
        aw = mw + cw
        # batch 1024 on world_comm (a*h = 384) exercises the r3
        # VMEM-guard tall-stack path (ops/fused_maddpg_update.py)
        batch = 1024 if scen == "simple_world_comm" else 512
        params = init_maddpg(jax.random.PRNGKey(0), obs_dim, aw, a)
        leaves, treedef = jax.tree.flatten(params)
        tkeys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
        targets = jax.tree.unflatten(
            treedef, [x + 0.1 * jax.random.normal(k, x.shape, x.dtype)
                      for x, k in zip(leaves, tkeys)])
        data = tm._random_batch(jax.random.PRNGKey(7), batch, a, obs_dim,
                                mw, cw, jnp.float32)
        want, _ = tm._replica_grads(params, targets, *data, mw=mw, cw=cw)
        mk = lambda **kw: fused_maddpg_update(
            a, obs_dim, aw, mw, hidden=64, batch=batch, gamma=tm.GAMMA,
            ent_coef=tm.ENTC, block_b=256, **kw)
        got, _ = mk()(params, targets, *data)
        twin, _ = mk(interpret=True)(params, targets, *data)
        ma, _, scale = _grad_diffs(got, twin)         # Mosaic lowering
        xa, xr, _ = _grad_diffs(got, want)            # vs jax.grad
        ok = (ma <= 1e-5 * max(scale, 1.0)
              and xa <= JAXGRAD_BUDGET * max(scale, 1.0))
        entry[scen] = {"ok": ok, "mosaic_vs_interpret_abs": ma,
                       "vs_jaxgrad_abs": xa, "vs_jaxgrad_rel": xr,
                       "scale": scale}
        print(f"{'upd_maddpg':12s} {scen:26s} {'OK  ' if ok else 'FAIL'} "
              f"mosaic|d|={ma:.3e} jaxgrad|d|={xa:.3e}", flush=True)
    report["upd_maddpg"] = entry
    return all(e["ok"] for e in entry.values())


def _lane_match_fraction(outs_a, outs_b, atol):
    """Fraction of env lanes (last axis) whose every output element
    matches within atol across all output tensors."""
    n = outs_a[0].shape[-1]
    worst = np.zeros(n)
    for a, b in zip(outs_a, outs_b):
        d = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))
        worst = np.maximum(worst, d.reshape(-1, n).max(axis=0))
    return float((worst <= atol).mean()), float(worst.max())


def check_traj(report, maddpg: bool):
    from mpe_tpu.learner.maddpg import init_maddpg, maddpg_act_dim
    from mpe_tpu.learner.pg import init_policy
    from mpe_tpu.envs import MpeEnv
    from mpe_tpu import scenarios
    from mpe_tpu.ops.fused_maddpg import fused_maddpg_trajectory
    from mpe_tpu.ops.fused_policy import fused_policy_trajectory
    from mpe_tpu.ops.kernel_scenarios import kernel_scenario

    name = "traj_maddpg" if maddpg else "traj_policy"
    entry = {}
    for scen in SCENARIOS:
        kscn = kernel_scenario(scen)
        env = MpeEnv(scenarios.load(scen), max_steps=25, auto_reset=True)
        n = 256
        if maddpg:
            params = init_maddpg(jax.random.PRNGKey(0), kscn.obs_w,
                                 maddpg_act_dim(env), env.n_agents)["actor"]
            build = lambda steps, tc, **kw: fused_maddpg_trajectory(
                kscn, params, n_envs=n, n_steps=steps, horizon=25,
                block_envs=128, t_chunk=tc, **kw)
        else:
            mw = 2 * kscn.spec.dim_p + 1
            dim_c = kscn.spec.dim_c if kscn.uses_comm else 0
            params = init_policy(jax.random.PRNGKey(0), kscn.obs_w,
                                 mw + dim_c)
            build = lambda steps, tc, **kw: fused_policy_trajectory(
                kscn, params, n_envs=n, n_steps=steps, horizon=25,
                block_envs=128, t_chunk=tc, **kw)

        res = {}
        for steps, tc, min_frac in ((1, 1, 1.0), (25, 5, 0.995)):
            mosaic = build(steps, tc, hash_rng=True)(7, params)
            xla = build(steps, tc, interpret=True)(7, params)
            frac, worst = _lane_match_fraction(
                [np.asarray(x) for x in jax.tree.leaves(mosaic)],
                [np.asarray(x) for x in jax.tree.leaves(xla)], atol=1e-4)
            ok = frac >= min_frac
            res[f"steps_{steps}"] = {"ok": ok, "lane_match_frac": frac,
                                     "worst_lane_maxdiff": worst}
            print(f"{name:12s} {scen:26s} steps={steps:3d} "
                  f"{'OK  ' if ok else 'FAIL'} lanes={frac*100:.2f}% "
                  f"worst={worst:.3e}", flush=True)
        entry[scen] = res
    report[name] = entry
    return all(r["ok"] for e in entry.values() for r in e.values())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sections", default=None)
    args = ap.parse_args()
    only = set(args.sections.split(",")) if args.sections else None

    checks = {
        "upd_ppo": lambda r: check_upd_ppo(r, mappo=False),
        "upd_mappo": lambda r: check_upd_ppo(r, mappo=True),
        "upd_maddpg": check_upd_maddpg,
        "traj_policy": lambda r: check_traj(r, maddpg=False),
        "traj_maddpg": lambda r: check_traj(r, maddpg=True),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tpu_train_parity_report.json")
    report = {}
    if only and os.path.exists(out):      # merge partial runs
        with open(out) as fh:
            report = json.load(fh)
    report["device"] = str(jax.devices()[0])
    ok = True
    for key, fn in checks.items():
        if only and key not in only:
            continue
        ok = fn(report) and ok
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"report -> {out}", flush=True)
    if not ok:
        print("FAILED", flush=True)
        sys.exit(1)
    print(f"training-kernel value parity OK on {report['device']}",
          flush=True)


if __name__ == "__main__":
    main()
