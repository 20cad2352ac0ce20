"""Deterministic fused-parity harness tests (mpe_tpu/ops/fused_parity).

These pin the harness itself on CPU (Pallas interpret mode): the
deterministic kernel must agree exactly with the plain-XLA twin, and the
deterministic step math must agree with the production kernel blocks.
The hardware leg — the same comparison with Mosaic actually compiling
the kernel — is tools/tpu_parity.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpe_tpu import scenarios as registry
from mpe_tpu.ops.fused_parity import (
    det_moves, fused_det_rollout, hash_uniform_2d, make_det_inputs,
    make_det_rollout, xla_det_rollout, xla_det_rollout_blocked)
from mpe_tpu.ops.kernel_scenarios import kernel_scenario


def test_hash_uniform_properties():
    u = np.asarray(hash_uniform_2d(jnp.int32(3), (8, 256)))
    assert u.shape == (8, 256)
    assert (u >= 0).all() and (u < 1).all()
    # deterministic; different salts decorrelate
    u2 = np.asarray(hash_uniform_2d(jnp.int32(3), (8, 256)))
    np.testing.assert_array_equal(u, u2)
    u3 = np.asarray(hash_uniform_2d(jnp.int32(4), (8, 256)))
    assert (u != u3).mean() > 0.99
    # roughly uniform
    assert 0.45 < u.mean() < 0.55


@pytest.mark.parametrize("name", registry.names())
def test_det_kernel_matches_xla_twin_interpret(name):
    """Interpret-mode fused == plain-XLA twin, exactly, for every
    scenario — incl. a 2-block grid vs the block-sliced XLA path."""
    inputs = make_det_inputs(name, n_envs=64, seed=11)
    fused = fused_det_rollout(name, 64, n_steps=6, block_envs=32,
                              interpret=True)
    ref = xla_det_rollout_blocked(name, 6, block_envs=32)
    for lbl, a, b in zip(("pos", "vel", "rew_sum", "rew", "obs"),
                         fused(*inputs), ref(*inputs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=f"{name}:{lbl}")


def test_det_rollout_exercises_dynamics():
    """The deterministic rollout is not trivially static: positions
    move, rewards accumulate, obs are populated."""
    inputs = make_det_inputs("simple_spread", n_envs=32, seed=0)
    pos, vel, rew_sum, rew, obs = xla_det_rollout("simple_spread", 10)(
        *inputs)
    assert (np.asarray(pos) != np.asarray(inputs[0])).any()
    assert np.abs(np.asarray(rew_sum)).max() > 0
    assert np.abs(np.asarray(obs)).max() > 0


def test_det_step_matches_production_kernel_blocks():
    """One deterministic step == the production kernel blocks driven
    with the same hashed actions (the det harness certifies exactly the
    code the production kernels run)."""
    for name in ("simple_tag", "simple_world_comm"):
        kscn = kernel_scenario(name)
        pos0, vel0, comm0, goal0 = make_det_inputs(name, 32, seed=2)
        n = pos0.shape[-1]
        move = det_moves(kscn.spec, jnp.int32(0), n)
        pos, vel = kscn.physics(pos0, vel0, move)
        comm = comm0 if kscn.uses_comm else None
        goal = goal0 if len(tuple(kscn.goal_choices or ())) else None
        rew, obs = kscn.reward_obs(pos, vel, comm, goal)
        p2, v2, rs2, r2, o2 = xla_det_rollout(name, 1)(
            pos0, vel0, comm0, goal0)
        # f32: XLA may fuse the jitted loop differently (fma
        # contraction), so compare at eps-level tolerance
        np.testing.assert_allclose(np.asarray(p2), np.asarray(pos),
                                   rtol=1e-5, atol=1e-6, err_msg=name)
        np.testing.assert_allclose(np.asarray(r2), np.asarray(rew),
                                   rtol=1e-5, atol=1e-6, err_msg=name)
        np.testing.assert_allclose(np.asarray(o2), np.asarray(obs),
                                   rtol=1e-5, atol=1e-6, err_msg=name)
