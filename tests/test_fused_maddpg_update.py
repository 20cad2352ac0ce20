"""ops/fused_maddpg_update: the hand-derived in-kernel MADDPG gradient
must match ``jax.grad`` of the identical XLA losses (CPU, interpret
mode), and the full fused update_fn must A/B-match the genuine
learner.maddpg.build_maddpg update_fn on the same sampled batch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpe_tpu import scenarios
from mpe_tpu.envs import MpeEnv
from mpe_tpu.learner.maddpg import (
    Buffer, build_fused_update, build_fused_update_chunk, build_maddpg,
    init_buffer, init_maddpg, maddpg_act_dim)
from mpe_tpu.ops.fused_maddpg_update import fused_maddpg_update
from mpe_tpu.ops.kernel_scenarios import kernel_scenario

GAMMA, ENTC = 0.95, 0.01


def _replica_grads(params, targets, obs_b, act_b, rew_b, obs2_b, *,
                   mw, cw, gamma=GAMMA, ent_coef=ENTC):
    """Dtype-general replica of learner.maddpg.update_fn's losses (the
    learner hard-casts to f32 inside actor_logits_i/critic_q_i; this
    copy keeps the input dtype so the kernel can be pinned at f64).
    Faithfulness to the genuine learner is guarded by
    test_fused_update_fn_matches_xla below."""
    batch, a, aw = act_b.shape
    dt = obs_b.dtype

    def mlp(p, x):
        x = jnp.tanh(x @ p["l1"]["w"] + p["l1"]["b"])
        x = jnp.tanh(x @ p["l2"]["w"] + p["l2"]["b"])
        return x @ p["out"]["w"] + p["out"]["b"]

    actor_i = lambda ap, o: mlp(ap, o)
    critic_i = lambda cp, j: mlp(cp, j)[..., 0]

    tgt_logits = jax.vmap(
        lambda o: jax.vmap(actor_i)(targets["actor"], o))(obs2_b)
    act2 = jax.nn.one_hot(jnp.argmax(tgt_logits[..., :mw], -1), mw,
                          dtype=dt)
    if cw:
        act2 = jnp.concatenate(
            [act2, jax.nn.one_hot(jnp.argmax(tgt_logits[..., mw:], -1),
                                  cw, dtype=dt)], axis=-1)
    joint2 = jnp.concatenate([obs2_b.reshape(batch, -1),
                              act2.reshape(batch, -1)], axis=-1)
    q_next = jax.vmap(lambda cp: critic_i(cp, joint2))(targets["critic"])
    y = jax.lax.stop_gradient(rew_b.T + gamma * q_next)

    def critic_loss(cp):
        joint = jnp.concatenate([obs_b.reshape(batch, -1),
                                 act_b.reshape(batch, -1)], axis=-1)
        q = jax.vmap(lambda c: critic_i(c, joint))(cp)
        return jnp.mean(jnp.square(q - y)), jnp.mean(q)

    (closs, qmean), cgrads = jax.value_and_grad(
        critic_loss, has_aux=True)(params["critic"])

    cwx = max(cw, 1)
    n_cand = mw * cwx
    cand_np = np.zeros((n_cand, aw))
    for k in range(mw):
        for j in range(cwx):
            cand_np[k * cwx + j, k] = 1.0
            if cw:
                cand_np[k * cwx + j, mw + j] = 1.0
    cand = jnp.asarray(cand_np, dt)

    def actor_loss(ap):
        logits = jax.vmap(lambda o: jax.vmap(actor_i)(ap, o))(obs_b)
        probs_m = jax.nn.softmax(logits[..., :mw])
        probs_c = jax.nn.softmax(logits[..., mw:]) if cw else None
        total = 0.0
        for i in range(a):
            cp = jax.tree.map(lambda x: x[i], params["critic"])
            mixed = jnp.broadcast_to(act_b, (n_cand,) + act_b.shape)
            mixed = mixed.at[:, :, i, :].set(cand[:, None, :])
            joint = jnp.concatenate(
                [jnp.broadcast_to(obs_b.reshape(1, batch, -1),
                                  (n_cand, batch, a * obs_b.shape[-1])),
                 mixed.reshape(n_cand, batch, -1)], axis=-1)
            q_all = critic_i(cp, joint)
            w = probs_m[:, i]
            if cw:
                w = (w[..., :, None] * probs_c[:, i][..., None, :]
                     ).reshape(batch, n_cand)
            exp_q = jnp.sum(w * jax.lax.stop_gradient(q_all.T), axis=-1)
            ent = -jnp.sum(probs_m[:, i]
                           * jnp.log(probs_m[:, i] + 1e-10), axis=-1)
            if cw:
                ent = ent - jnp.sum(
                    probs_c[:, i] * jnp.log(probs_c[:, i] + 1e-10),
                    axis=-1)
            total = total - (exp_q + ent_coef * ent).mean()
        return total / a

    aloss, agrads = jax.value_and_grad(actor_loss)(params["actor"])
    return ({"actor": agrads, "critic": cgrads},
            (closs, aloss, qmean))


def _dims(name):
    kscn = kernel_scenario(name)
    spec = kscn.spec
    mw = 2 * spec.dim_p + 1
    cw = 0 if all(spec.silent) else spec.dim_c
    return kscn.obs_w, spec.n_agents, mw, cw


def _random_batch(key, batch, a, obs_dim, mw, cw, dt):
    ks = jax.random.split(key, 5)
    obs_b = jax.random.normal(ks[0], (batch, a, obs_dim), dt)
    obs2_b = jax.random.normal(ks[1], (batch, a, obs_dim), dt)
    rew_b = jax.random.normal(ks[2], (batch, a), dt)
    act = jax.nn.one_hot(jax.random.randint(ks[3], (batch, a), 0, mw),
                         mw, dtype=dt)
    if cw:
        act = jnp.concatenate(
            [act, jax.nn.one_hot(
                jax.random.randint(ks[4], (batch, a), 0, cw), cw,
                dtype=dt)], axis=-1)
    return obs_b, act, rew_b, obs2_b


@pytest.mark.parametrize("name", ["simple_spread",
                                  "simple_speaker_listener",
                                  "simple_reference",
                                  "simple_tag",
                                  "simple_world_comm"])
def test_fused_maddpg_update_grads_match_jax_grad_f64(name):
    obs_dim, a, mw, cw = _dims(name)
    aw = mw + cw
    batch = 128
    f64 = jnp.float64

    params = jax.tree.map(
        lambda x: x.astype(f64),
        init_maddpg(jax.random.PRNGKey(0), obs_dim, aw, a, hidden=32))
    # distinct targets (per-leaf perturbation) so the target-net paths
    # are exercised
    leaves, treedef = jax.tree.flatten(params)
    tkeys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    targets = jax.tree.unflatten(
        treedef, [x.astype(f64) + 0.1 * jax.random.normal(k, x.shape, f64)
                  for x, k in zip(leaves, tkeys)])

    batch_data = _random_batch(jax.random.PRNGKey(7), batch, a, obs_dim,
                               mw, cw, f64)

    want, (closs, aloss, qmean) = _replica_grads(
        params, targets, *batch_data, mw=mw, cw=cw)

    grads_fn = fused_maddpg_update(
        a, obs_dim, aw, mw, hidden=32, batch=batch, gamma=GAMMA,
        ent_coef=ENTC, block_b=64, interpret=True, compute_dtype=f64)
    got, (closs_k, aloss_k, qmean_k) = grads_fn(params, targets,
                                                *batch_data)

    flat_w = jax.tree.flatten_with_path(want)[0]
    flat_g = dict(jax.tree.flatten_with_path(got)[0])
    scale = max(float(jnp.abs(leaf).max()) for _, leaf in flat_w)
    for path, w in flat_w:
        np.testing.assert_allclose(
            np.asarray(flat_g[path]), np.asarray(w),
            atol=1e-9 * max(scale, 1.0), rtol=1e-9, err_msg=str(path))
    np.testing.assert_allclose(float(closs_k), float(closs), rtol=1e-9)
    np.testing.assert_allclose(float(aloss_k), float(aloss), rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_allclose(float(qmean_k), float(qmean), rtol=1e-9,
                               atol=1e-12)


def test_fused_update_fn_matches_xla():
    """Full drop-in A/B: build_fused_update == build_maddpg's update_fn
    on the same buffer and key (f32, one update incl. adam + polyak +
    actor gating)."""
    env = MpeEnv(scenarios.load("simple_spread"), max_steps=25,
                 auto_reset=True)
    obs_dim = env.scenario.obs_width
    aw = maddpg_act_dim(env)
    a = env.n_agents
    mw = 2 * env.spec.dim_p + 1
    batch, capacity = 64, 512

    params = init_maddpg(jax.random.PRNGKey(0), obs_dim, aw, a)
    targets = jax.tree.map(lambda x: x, params)
    _, _, update_xla, init_opt = build_maddpg(
        env, n_envs=8, capacity=capacity, batch=batch, gamma=GAMMA,
        tau_polyak=0.05, ent_coef=ENTC)
    update_fused = build_fused_update(
        env, batch=batch, gamma=GAMMA, tau_polyak=0.05, ent_coef=ENTC,
        block_b=64, interpret=True)
    opt_states = init_opt(params)

    f32 = jnp.float32
    obs_b, act_b, rew_b, obs2_b = _random_batch(
        jax.random.PRNGKey(3), capacity, a, obs_dim, mw, aw - mw, f32)
    buffer = Buffer.pack(obs_b, act_b, rew_b, obs2_b,
                         ptr=jnp.int32(0), size=jnp.int32(capacity))

    key = jax.random.PRNGKey(11)
    for do_actor in (True, False):
        px, tx, ox, mx = update_xla(params, targets, opt_states, buffer,
                                    key, do_actor)
        pf, tf, of, mf = update_fused(params, targets, opt_states, buffer,
                                      key, do_actor)
        for k in ("critic_loss", "actor_loss", "q"):
            np.testing.assert_allclose(float(mf[k]), float(mx[k]),
                                       rtol=2e-4, atol=1e-5, err_msg=k)
        for name, got, want in (("params", pf, px), ("targets", tf, tx)):
            fw = jax.tree.flatten_with_path(want)[0]
            fg = dict(jax.tree.flatten_with_path(got)[0])
            for path, w in fw:
                np.testing.assert_allclose(
                    np.asarray(fg[path]), np.asarray(w), atol=2e-5,
                    rtol=1e-3, err_msg=f"{name}{path} do_actor={do_actor}")


def test_update_chunk_matches_per_update_loop():
    """build_fused_update_chunk (one pre-gathered replay read + scanned
    kernel updates) must EXACTLY reproduce a Python loop of
    build_fused_update's update_fn under the same key schedule
    (update u's key = fold_in(key, u)) and gate schedule."""
    env = MpeEnv(scenarios.load("simple_spread"), max_steps=25,
                 auto_reset=True)
    obs_dim = env.scenario.obs_width
    aw = maddpg_act_dim(env)
    a = env.n_agents
    mw = 2 * env.spec.dim_p + 1
    batch, capacity, n_updates = 64, 512, 6

    params = init_maddpg(jax.random.PRNGKey(0), obs_dim, aw, a)
    targets = jax.tree.map(lambda x: x, params)
    _, _, _, init_opt = build_maddpg(env, n_envs=8, capacity=capacity,
                                     batch=batch, tau_polyak=0.03)
    per_update = build_fused_update(env, batch=batch, tau_polyak=0.03,
                                    block_b=64, interpret=True)
    chunk = build_fused_update_chunk(env, n_updates, batch=batch,
                                     tau_polyak=0.03, block_b=64,
                                     interpret=True,
                                     grad_engine="kernel")
    opt_states = init_opt(params)
    f32 = jnp.float32
    obs_b, act_b, rew_b, obs2_b = _random_batch(
        jax.random.PRNGKey(3), capacity, a, obs_dim, mw, aw - mw, f32)
    buffer = Buffer.pack(obs_b, act_b, rew_b, obs2_b,
                         ptr=jnp.int32(0), size=jnp.int32(capacity))

    key = jax.random.PRNGKey(21)
    gates = [u >= 2 and u % 2 == 0 for u in range(n_updates)]

    pl_, tl, ol = params, targets, opt_states
    for u in range(n_updates):
        pl_, tl, ol, ml = per_update(pl_, tl, ol, buffer,
                                     jax.random.fold_in(key, u), gates[u])
    pc, tc, oc, mc = chunk(params, targets, opt_states, buffer, key,
                           jnp.asarray(gates))

    # identical math; scan-vs-loop compilation may reassociate f32
    # arithmetic (measured <=1e-9 drift over 6 updates), so tight
    # allclose rather than bitwise
    for name, got, want in (("params", pc, pl_), ("targets", tc, tl)):
        fw = jax.tree.flatten_with_path(want)[0]
        fg = dict(jax.tree.flatten_with_path(got)[0])
        for path, w in fw:
            np.testing.assert_allclose(
                np.asarray(fg[path]), np.asarray(w), atol=1e-7,
                rtol=1e-5, err_msg=f"{name}{path}")
    for k in ("critic_loss", "actor_loss", "q"):
        np.testing.assert_allclose(np.asarray(mc[k]), np.asarray(ml[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)


def test_update_chunk_xla_engine_matches_update_fn_loop():
    """The chunk trainer's "xla" grad engine runs the SAME
    maddpg_xla_grads code as build_maddpg's update_fn, so a chunk must
    reproduce the update_fn loop under the matching key schedule."""
    env = MpeEnv(scenarios.load("simple_spread"), max_steps=25,
                 auto_reset=True)
    obs_dim = env.scenario.obs_width
    aw = maddpg_act_dim(env)
    a = env.n_agents
    mw = 2 * env.spec.dim_p + 1
    batch, capacity, n_updates = 64, 512, 5

    params = init_maddpg(jax.random.PRNGKey(0), obs_dim, aw, a)
    targets = jax.tree.map(lambda x: x, params)
    _, _, update_xla, init_opt = build_maddpg(
        env, n_envs=8, capacity=capacity, batch=batch, tau_polyak=0.03)
    chunk = build_fused_update_chunk(env, n_updates, batch=batch,
                                     tau_polyak=0.03, grad_engine="xla")
    opt_states = init_opt(params)
    obs_b, act_b, rew_b, obs2_b = _random_batch(
        jax.random.PRNGKey(3), capacity, a, obs_dim, mw, aw - mw,
        jnp.float32)
    buffer = Buffer.pack(obs_b, act_b, rew_b, obs2_b,
                         ptr=jnp.int32(0), size=jnp.int32(capacity))

    key = jax.random.PRNGKey(31)
    gates = [True, False, True, True, False]
    pl_, tl, ol = params, targets, opt_states
    for u in range(n_updates):
        pl_, tl, ol, ml = update_xla(pl_, tl, ol, buffer,
                                     jax.random.fold_in(key, u), gates[u])
    pc, tc, oc, mc = chunk(params, targets, opt_states, buffer, key,
                           jnp.asarray(gates))
    for name, got, want in (("params", pc, pl_), ("targets", tc, tl)):
        fw = jax.tree.flatten_with_path(want)[0]
        fg = dict(jax.tree.flatten_with_path(got)[0])
        for path, w in fw:
            np.testing.assert_allclose(
                np.asarray(fg[path]), np.asarray(w), atol=1e-7,
                rtol=1e-5, err_msg=f"{name}{path}")


def test_persistent_packed_state_matches_update_chunk():
    """The pack-once-per-run API (pack_state -> packed_step* ->
    unpack_state; fused_loop.py's carry) must reproduce the per-chunk
    update_chunk exactly: pack/unpack are exact inverses (values +
    zeros only) and the packed-space scan is the same math. Also pins
    actor_of == the unpacked actor params (what the collection kernel
    consumes)."""
    env = MpeEnv(scenarios.load("simple_spread"), max_steps=25,
                 auto_reset=True)
    obs_dim = env.scenario.obs_width
    aw = maddpg_act_dim(env)
    a = env.n_agents
    mw = 2 * env.spec.dim_p + 1
    batch, capacity, n_updates = 64, 512, 4

    params = init_maddpg(jax.random.PRNGKey(0), obs_dim, aw, a)
    targets = jax.tree.map(lambda x: x, params)
    chunk = build_fused_update_chunk(env, n_updates, batch=batch,
                                     tau_polyak=0.03, block_b=64,
                                     interpret=True,
                                     grad_engine="kernel")
    opt_states = chunk.init_opt(params)
    f32 = jnp.float32
    obs_b, act_b, rew_b, obs2_b = _random_batch(
        jax.random.PRNGKey(3), capacity, a, obs_dim, mw, aw - mw, f32)
    buffer = Buffer.pack(obs_b, act_b, rew_b, obs2_b,
                         ptr=jnp.int32(0), size=jnp.int32(capacity))
    gates = jnp.asarray([False, True, True, True])

    # pack -> unpack roundtrip is exact
    ps = chunk.pack_state(params, targets, opt_states)
    rt = chunk.unpack_state(ps)
    for got, want in zip(jax.tree.leaves(rt),
                         jax.tree.leaves((params, targets, opt_states))):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for got, want in zip(jax.tree.leaves(chunk.actor_of(ps)),
                         jax.tree.leaves(params["actor"])):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # two packed chunks == two update_chunk calls
    k1, k2 = jax.random.PRNGKey(5), jax.random.PRNGKey(6)
    ps, m1p = chunk.packed_step(ps, buffer, k1, gates)
    ps, m2p = chunk.packed_step(ps, buffer, k2, gates)
    pu, tu, ou = params, targets, opt_states
    pu, tu, ou, m1 = chunk(pu, tu, ou, buffer, k1, gates)
    pu, tu, ou, m2 = chunk(pu, tu, ou, buffer, k2, gates)
    got = chunk.unpack_state(ps)
    for name, g, w in (("params", got[0], pu), ("targets", got[1], tu)):
        fw = jax.tree.flatten_with_path(w)[0]
        fg = dict(jax.tree.flatten_with_path(g)[0])
        for path, want in fw:
            np.testing.assert_allclose(
                np.asarray(fg[path]), np.asarray(want), atol=1e-7,
                rtol=1e-5, err_msg=f"{name}{path}")
    for k in ("critic_loss", "actor_loss", "q"):
        np.testing.assert_allclose(np.asarray(m2p[k]), np.asarray(m2[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)


def test_per_agent_gates():
    """Per-agent actor gating (the two-timescale schedules of
    tools/crypto_study.py): a UNIFORM [U, A] gate matrix must be
    bit-identical to the scalar [U] schedule, and with heterogeneous
    gates a gated-off agent's actor params AND adam moments stay
    exactly frozen while the others move — on both gradient engines
    (the kernel engine applies the gates in PACKED weight space via
    block-diagonal agent masks), which must agree with each other.
    Both engines run inside this one test so the cross-engine pin
    cannot be silently skipped by -k filtering or test sharding."""
    env = MpeEnv(scenarios.load("simple_spread"), max_steps=25,
                 auto_reset=True)
    obs_dim = env.scenario.obs_width
    aw = maddpg_act_dim(env)
    a = env.n_agents
    mw = 2 * env.spec.dim_p + 1
    batch, capacity, n_updates = 64, 512, 5

    # f64 throughout so the cross-engine pin below can be exact: with
    # f32, adam's 1/sqrt(nu) normalization turns ~1e-7 cross-engine
    # gradient drift into ~1e-4 parameter drift within 5 updates
    f64 = jnp.float64
    params = jax.tree.map(
        lambda x: x.astype(f64),
        init_maddpg(jax.random.PRNGKey(0), obs_dim, aw, a))
    targets = jax.tree.map(lambda x: x, params)
    obs_b, act_b, rew_b, obs2_b = _random_batch(
        jax.random.PRNGKey(3), capacity, a, obs_dim, mw, aw - mw, f64)
    buffer = Buffer.pack(obs_b, act_b, rew_b, obs2_b,
                         ptr=jnp.int32(0), size=jnp.int32(capacity))
    key = jax.random.PRNGKey(21)
    gates_s = jnp.asarray([False, True, False, True, True])
    gates_m = jnp.broadcast_to(gates_s[:, None], (n_updates, a))
    het = gates_m.at[:, 2].set(False)

    results = {}
    for engine in ("kernel", "xla"):
        chunk = build_fused_update_chunk(
            env, n_updates, batch=batch, tau_polyak=0.03, block_b=64,
            interpret=True, grad_engine=engine, compute_dtype=f64)
        opt_states = chunk.init_opt(params)

        # (a) uniform matrix == scalar schedule, bitwise
        out_s = chunk(params, targets, opt_states, buffer, key, gates_s)
        out_m = chunk(params, targets, opt_states, buffer, key, gates_m)
        for got, want in zip(jax.tree.leaves(out_m[:3]),
                             jax.tree.leaves(out_s[:3])):
            np.testing.assert_array_equal(np.asarray(got),
                                          np.asarray(want))

        # (b) heterogeneous: agent 2's actor fully gated off stays
        # frozen (params + adam mu/nu); agents 0/1 move; critic
        # updates everywhere
        ph, th, oh, _ = chunk(params, targets, opt_states, buffer, key,
                              het)
        for path, leaf in jax.tree.flatten_with_path(ph["actor"])[0]:
            init = dict(jax.tree.flatten_with_path(
                params["actor"])[0])[path]
            np.testing.assert_array_equal(
                np.asarray(leaf[2]), np.asarray(init[2]),
                err_msg=f"frozen agent moved ({engine}): {path}")
            assert np.abs(np.asarray(leaf[:2])
                          - np.asarray(init[:2])).max() > 0, (
                f"live agents did not move ({engine}): {path}")
        adam_h = oh["actor"][0]
        for tree in (adam_h.mu, adam_h.nu):
            for leaf in jax.tree.leaves(tree):
                np.testing.assert_array_equal(
                    np.asarray(leaf[2]),
                    np.zeros_like(np.asarray(leaf[2])))
        # critic moved for every agent
        for leaf, init in zip(jax.tree.leaves(ph["critic"]),
                              jax.tree.leaves(params["critic"])):
            assert np.abs(np.asarray(leaf)
                          - np.asarray(init)).max() > 0
        results[engine] = (ph, th)

    # cross-engine pin. adam divides by sqrt(nu)+eps, so even f64
    # order-of-operations noise between the engines' gradient
    # computations amplifies on near-zero-gradient elements (measured
    # max 2.5e-7 after 5 updates, deterministic for these seeds); a
    # mis-gated agent would differ by ~lr x steps (~3e-3) on EVERY
    # element, well above this envelope
    for g, w in zip(jax.tree.leaves(results["kernel"]),
                    jax.tree.leaves(results["xla"])):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-5, rtol=1e-4)


def test_fused_loop_actor_period_wiring():
    """run_fused_maddpg's ``actor_period`` schedule wiring: the trivial
    period ``(1, 1, 1)`` expands the scalar schedule to a uniform
    [horizon, A] matrix, which test_per_agent_gates pins bit-identical
    to the scalar path — so the whole run must be bit-identical to
    ``actor_period=None``; a heterogeneous period must diverge (tiny
    CPU-interpret run, 1 chunk)."""
    from mpe_tpu.learner.fused_loop import run_fused_maddpg

    kw = dict(updates=25, n_envs=8, batch=32, block=1, actor_start=2,
              seed=3)
    base, _ = run_fused_maddpg("simple_spread", **kw)
    unif, _ = run_fused_maddpg("simple_spread",
                               actor_period=(1, 1, 1), **kw)
    for got, want in zip(jax.tree.leaves(unif), jax.tree.leaves(base)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    het, _ = run_fused_maddpg("simple_spread", actor_period=(1, 1, 5),
                              **kw)
    assert any(
        np.abs(np.asarray(g) - np.asarray(w)).max() > 0
        for g, w in zip(jax.tree.leaves(het["actor"]),
                        jax.tree.leaves(base["actor"]))), (
        "heterogeneous actor_period produced the default schedule")


def test_fused_runner_reuse_matches_wrapper():
    """build_fused_maddpg_runner is the machinery under
    run_fused_maddpg; a reused runner must reproduce the one-shot
    wrapper bit-for-bit (same seed), stay deterministic across calls,
    and diverge when the collection stream base changes — the
    executable-reuse contract tools/crypto_pbt.py trains hundreds of
    member-runs on."""
    from mpe_tpu.learner.fused_loop import (build_fused_maddpg_runner,
                                            run_fused_maddpg)

    kw = dict(n_envs=8, batch=32, block=1)
    runner = build_fused_maddpg_runner("simple_spread", **kw)
    a1, _ = runner(25, seed=3, actor_start=2)
    a2, _ = runner(25, seed=3, actor_start=2)        # reuse, same seed
    w, _ = run_fused_maddpg("simple_spread", updates=25, seed=3,
                            actor_start=2, **kw)
    for got, ref in zip(jax.tree.leaves(a1), jax.tree.leaves(w)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    for got, ref in zip(jax.tree.leaves(a1), jax.tree.leaves(a2)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    b, _ = runner(25, seed=3, actor_start=2, collect_seed0=77_000)
    assert any(
        np.abs(np.asarray(g) - np.asarray(r)).max() > 0
        for g, r in zip(jax.tree.leaves(b), jax.tree.leaves(a1))), (
        "changing the collection stream base did not change training")
