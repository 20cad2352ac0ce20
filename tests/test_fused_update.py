"""ops/fused_update: the hand-derived in-kernel PPO gradient must match
``jax.grad`` of the identical XLA loss (CPU, interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpe_tpu.learner.fused_ppo import (
    _factored_logp_ent, _factored_onehots, _head_minor, _torso_minor)
from mpe_tpu.learner.ppo import init_ac
from mpe_tpu.ops.fused_update import fused_ppo_update
from mpe_tpu.ops.kernel_scenarios import kernel_scenario

CLIP, VF, ENTC = 0.2, 0.5, 0.01


def _xla_loss(kscn, params, batch, dt=jnp.float32):
    """The exact loss of learner.fused_ppo.build_fused_ppo_step (f32,
    adv pre-normalized)."""
    obs, mv_oh, cm_oh, logp_old, value_old, adv_n, ret = batch

    def forward(p, o):
        h = _torso_minor(p["l1"], p["l2"], o, dt)
        return (_head_minor(p["pi"], h, dt),
                _head_minor(p["v"], h, dt)[..., 0, :])

    logits, value = forward(params, obs)
    logp, ent = _factored_logp_ent(kscn, logits, mv_oh, cm_oh)
    ratio = jnp.exp(logp - logp_old)
    pg = -jnp.minimum(ratio * adv_n,
                      jnp.clip(ratio, 1 - CLIP, 1 + CLIP) * adv_n).mean()
    v_clip = value_old + jnp.clip(value - value_old, -CLIP, CLIP)
    vloss = jnp.maximum(jnp.square(value - ret),
                        jnp.square(v_clip - ret)).mean()
    return pg + VF * vloss - ENTC * ent.mean(), (pg, vloss, ent.mean())


def _random_batch(kscn, params, key, t, n):
    """A realistic batch: obs ~ N(0,1), actions sampled from the policy,
    logp_old from the same forward (epoch-0 shape), adv/ret random."""
    spec = kscn.spec
    a = spec.n_agents
    mw = 2 * spec.dim_p + 1
    dim_c = spec.dim_c if kscn.uses_comm else 0
    ks = jax.random.split(key, 6)
    obs = jax.random.normal(ks[0], (t, a, kscn.obs_w, n), jnp.float32)

    h = _torso_minor(params["l1"], params["l2"], obs)
    logits = _head_minor(params["pi"], h)
    act = jax.random.categorical(ks[1], jnp.moveaxis(logits[..., :mw, :],
                                                     -2, -1))
    cact = (jax.random.categorical(
        ks[2], jnp.moveaxis(logits[..., mw:, :], -2, -1))
        if dim_c else act)
    mv_oh, cm_oh = _factored_onehots(kscn, act, cact)
    logp_old, _ = _factored_logp_ent(kscn, logits, mv_oh, cm_oh)
    # perturb so ratio != 1 and some elements clip
    logp_old = logp_old + 0.3 * jax.random.normal(
        ks[3], logp_old.shape, jnp.float32)
    adv = jax.random.normal(ks[4], (t, a, n), jnp.float32)
    adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
    ret = jax.random.normal(ks[5], (t, a, n), jnp.float32)
    value_old = _head_minor(params["v"], h)[..., 0, :]
    return obs, mv_oh, cm_oh, logp_old, value_old, adv_n, ret


@pytest.mark.parametrize("name", ["simple_spread",
                                  "simple_speaker_listener",
                                  "simple_reference",
                                  "simple_tag",
                                  "simple_world_comm"])
def test_fused_update_grads_match_jax_grad(name):
    kscn = kernel_scenario(name)
    mw = 2 * kscn.spec.dim_p + 1
    dim_c = kscn.spec.dim_c if kscn.uses_comm else 0
    t, n = 8, 128
    params = init_ac(jax.random.PRNGKey(0), kscn.obs_w, mw + dim_c,
                     hidden=32, dtype=jnp.float32)
    batch = _random_batch(kscn, params, jax.random.PRNGKey(1), t, n)
    obs, mv_oh, cm_oh, logp_old, value_old, adv_n, ret = batch

    (loss, (pg, vl, ent)), want = jax.value_and_grad(
        lambda p, b: _xla_loss(kscn, p, b), has_aux=True)(params, batch)

    update = fused_ppo_update(kscn, n_envs=n, n_steps=t, hidden=32,
                              clip=CLIP, vf_coef=VF, ent_coef=ENTC,
                              block_envs=64, t_chunk=4, interpret=True)
    got, (pg_k, vl_k, ent_k) = update(
        params, obs, mv_oh, cm_oh, logp_old, adv_n, ret, value_old)

    flat_w, _ = jax.tree.flatten_with_path(want)
    flat_g = dict(jax.tree.flatten_with_path(got)[0])
    scale = max(float(jnp.abs(leaf).max()) for _, leaf in flat_w)
    for path, w in flat_w:
        g = flat_g[path]
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=5e-5 * max(scale, 1.0),
            rtol=2e-4, err_msg=str(path))
    np.testing.assert_allclose(float(pg_k), float(pg), rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose(float(vl_k), float(vl), rtol=1e-5)
    np.testing.assert_allclose(float(ent_k), float(ent), rtol=1e-5)


def _xla_mappo_loss(kscn, params, batch, dt=jnp.float32):
    """The exact loss of learner.fused_ppo.build_fused_mappo_step (adv
    pre-normalized; team-level value/adv/ret streams)."""
    obs, mv_oh, cm_oh, logp_old, value_old, adv_n, ret = batch
    a = kscn.spec.n_agents

    h = _torso_minor(params["a1"], params["a2"], obs, dt)
    logits = _head_minor(params["pi"], h, dt)
    joint = obs.reshape(obs.shape[:-3] + (a * kscn.obs_w,)
                        + obs.shape[-1:])
    hc = _torso_minor(params["c1"], params["c2"], joint, dt)
    value = _head_minor(params["v"], hc, dt)[..., 0, :]

    logp, ent = _factored_logp_ent(kscn, logits, mv_oh, cm_oh)
    ratio = jnp.exp(logp - logp_old)
    adv_b = adv_n[..., None, :]
    pg = -jnp.minimum(ratio * adv_b,
                      jnp.clip(ratio, 1 - CLIP, 1 + CLIP) * adv_b).mean()
    v_clip = value_old + jnp.clip(value - value_old, -CLIP, CLIP)
    vloss = jnp.maximum(jnp.square(value - ret),
                        jnp.square(v_clip - ret)).mean()
    return pg + VF * vloss - ENTC * ent.mean(), (pg, vloss, ent.mean())


def _random_mappo_batch(kscn, params, key, t, n):
    spec = kscn.spec
    a = spec.n_agents
    mw = 2 * spec.dim_p + 1
    dim_c = spec.dim_c if kscn.uses_comm else 0
    ks = jax.random.split(key, 6)
    obs = jax.random.normal(ks[0], (t, a, kscn.obs_w, n), jnp.float32)

    h = _torso_minor(params["a1"], params["a2"], obs)
    logits = _head_minor(params["pi"], h)
    act = jax.random.categorical(ks[1], jnp.moveaxis(logits[..., :mw, :],
                                                     -2, -1))
    cact = (jax.random.categorical(
        ks[2], jnp.moveaxis(logits[..., mw:, :], -2, -1))
        if dim_c else act)
    mv_oh, cm_oh = _factored_onehots(kscn, act, cact)
    logp_old, _ = _factored_logp_ent(kscn, logits, mv_oh, cm_oh)
    logp_old = logp_old + 0.3 * jax.random.normal(
        ks[3], logp_old.shape, jnp.float32)
    adv = jax.random.normal(ks[4], (t, n), jnp.float32)      # team adv
    adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
    ret = jax.random.normal(ks[5], (t, n), jnp.float32)
    joint = obs.reshape((t, a * kscn.obs_w, n))
    hc = _torso_minor(params["c1"], params["c2"], joint)
    value_old = _head_minor(params["v"], hc)[..., 0, :]
    return obs, mv_oh, cm_oh, logp_old, value_old, adv_n, ret


@pytest.mark.parametrize("name", ["simple_spread",
                                  "simple_speaker_listener",
                                  "simple_reference",
                                  "simple_tag",
                                  "simple_world_comm"])
def test_fused_mappo_update_grads_match_jax_grad(name):
    from mpe_tpu.learner.ppo import init_mappo
    from mpe_tpu.ops.fused_update import fused_mappo_update

    kscn = kernel_scenario(name)
    mw = 2 * kscn.spec.dim_p + 1
    dim_c = kscn.spec.dim_c if kscn.uses_comm else 0
    t, n = 8, 128
    params = init_mappo(jax.random.PRNGKey(0), kscn.obs_w, mw + dim_c,
                        kscn.spec.n_agents, hidden=32)
    batch = _random_mappo_batch(kscn, params, jax.random.PRNGKey(1), t, n)
    obs, mv_oh, cm_oh, logp_old, value_old, adv_n, ret = batch

    (loss, (pg, vl, ent)), want = jax.value_and_grad(
        lambda p, b: _xla_mappo_loss(kscn, p, b), has_aux=True)(
            params, batch)

    update = fused_mappo_update(kscn, n_envs=n, n_steps=t, hidden=32,
                                clip=CLIP, vf_coef=VF, ent_coef=ENTC,
                                block_envs=64, t_chunk=4, interpret=True)
    got, (pg_k, vl_k, ent_k) = update(
        params, obs, mv_oh, cm_oh, logp_old, adv_n, ret, value_old)

    flat_w, _ = jax.tree.flatten_with_path(want)
    flat_g = dict(jax.tree.flatten_with_path(got)[0])
    scale = max(float(jnp.abs(leaf).max()) for _, leaf in flat_w)
    for path, w in flat_w:
        g = flat_g[path]
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=5e-5 * max(scale, 1.0),
            rtol=2e-4, err_msg=str(path))
    np.testing.assert_allclose(float(pg_k), float(pg), rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose(float(vl_k), float(vl), rtol=1e-5)
    np.testing.assert_allclose(float(ent_k), float(ent), rtol=1e-5)


def test_fused_mappo_update_grad_f64():
    """x64: the analytic MAPPO gradient matches jax.grad to machine
    precision (actor AND centralized-critic paths)."""
    from mpe_tpu.learner.ppo import init_mappo
    from mpe_tpu.ops.fused_update import fused_mappo_update

    kscn = kernel_scenario("simple_spread")
    t, n = 4, 64
    params = init_mappo(jax.random.PRNGKey(2), kscn.obs_w, 5,
                        kscn.spec.n_agents, hidden=16)
    params = jax.tree.map(lambda x: x.astype(jnp.float64), params)
    batch = _random_mappo_batch(kscn, params, jax.random.PRNGKey(3), t, n)
    batch = jax.tree.map(lambda x: x.astype(jnp.float64), batch)
    obs, mv_oh, cm_oh, logp_old, value_old, adv_n, ret = batch

    _, want = jax.value_and_grad(
        lambda p, b: _xla_mappo_loss(kscn, p, b, jnp.float64),
        has_aux=True)(params, batch)

    update = fused_mappo_update(kscn, n_envs=n, n_steps=t, hidden=16,
                                clip=CLIP, vf_coef=VF, ent_coef=ENTC,
                                block_envs=64, t_chunk=4, interpret=True,
                                compute_dtype=jnp.float64)
    got, _ = update(params, obs, mv_oh, cm_oh, logp_old, adv_n, ret,
                    value_old)
    for (pw, w), (pg_, g) in zip(jax.tree.flatten_with_path(want)[0],
                                 jax.tree.flatten_with_path(got)[0]):
        assert pw == pg_
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-9, atol=1e-12,
                                   err_msg=str(pw))


def test_fused_update_grad_wrt_jax_grad_f64():
    """x64 check: with f64 inputs the analytic gradient matches
    jax.grad to near machine precision (no indicator-branch mistakes)."""
    kscn = kernel_scenario("simple_spread")
    t, n = 4, 64
    params = init_ac(jax.random.PRNGKey(2), kscn.obs_w, 5, hidden=16,
                     dtype=jnp.float64)
    batch = _random_batch(kscn, params, jax.random.PRNGKey(3), t, n)
    batch = jax.tree.map(lambda x: x.astype(jnp.float64), batch)
    obs, mv_oh, cm_oh, logp_old, value_old, adv_n, ret = batch

    _, want = jax.value_and_grad(
        lambda p, b: _xla_loss(kscn, p, b, jnp.float64),
        has_aux=True)(params, batch)

    update = fused_ppo_update(kscn, n_envs=n, n_steps=t, hidden=16,
                              clip=CLIP, vf_coef=VF, ent_coef=ENTC,
                              block_envs=64, t_chunk=4, interpret=True,
                              compute_dtype=jnp.float64)
    got, _ = update(params, obs, mv_oh, cm_oh, logp_old, adv_n, ret,
                    value_old)
    for (pw, w), (pg_, g) in zip(jax.tree.flatten_with_path(want)[0],
                                 jax.tree.flatten_with_path(got)[0]):
        assert pw == pg_
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-9, atol=1e-12,
                                   err_msg=str(pw))
