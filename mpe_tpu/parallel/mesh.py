"""Multi-chip scale-out: env-axis sharding over a device mesh.

The reference has no distributed machinery of any kind — its only batching
is ``BatchMultiAgentEnv``'s sequential Python loop (reference
environment.py:309-322; SURVEY.md §2.4). The TPU-native scaling model:

  - envs are embarrassingly parallel: a 1-D ``('env',)`` mesh, every
    ``WorldState`` leaf sharded on its leading env axis;
  - physics/scenario code never communicates across envs, so the compiled
    program contains **zero collectives on the hot path** — XLA partitions
    the vmapped step into purely local per-device compute;
  - collectives appear only where they should: metric reductions
    (``psum`` over the env axis) and trajectory hand-off to a learner
    (see mpe_tpu.learner for a data-parallel training step with gradient
    ``pmean`` over the same mesh);
  - multi-host: same code under ``jax.distributed.initialize`` — each
    host folds its process index into the key (``fold_host_key``) and
    contributes its local devices to the global mesh.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpe_tpu.envs.functional import MpeEnv


def env_mesh(devices=None, axis_name: str = "env") -> Mesh:
    """A 1-D mesh over all (or the given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (axis_name,))


def env_sharding(mesh: Mesh, axis_name: str = "env") -> NamedSharding:
    """Shard the leading (env) axis of every pytree leaf over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def fold_host_key(key: jax.Array) -> jax.Array:
    """Distinct per-host key stream for multi-host launches."""
    return jax.random.fold_in(key, jax.process_index())


def _uniform_actions(
    env: MpeEnv, key: jax.Array, n_envs: int, env_axis: int = 0
) -> jax.Array:
    from mpe_tpu.core.actions import ActionMode

    # always draw in canonical [n_envs, A, W] shape so the sampled values
    # are identical across layouts, then transpose for env-minor
    shape = (n_envs, env.n_agents, env.action_width)
    if env.action_mode is ActionMode.DISCRETE_INDEX:
        # column 0 is the move index in [0, 5), column 1 the comm index
        # in [0, dim_c) — sampling both from the move range would emit
        # out-of-range comm indices (one_hot maps them to all-zero comm,
        # a state the reference can never produce) and never sample
        # messages above index 4 when dim_c > 5
        km, kc = jax.random.split(key)
        move = jax.random.randint(
            km, shape[:2] + (1,), 0, 2 * env.spec.dim_p + 1, jnp.int32)
        comm = jax.random.randint(
            kc, shape[:2] + (1,), 0, max(env.spec.dim_c, 1), jnp.int32)
        acts = jnp.concatenate([move, comm], axis=-1)
    else:
        acts = jax.random.uniform(key, shape, env.dtype)
    return acts if env_axis == 0 else jnp.moveaxis(acts, 0, -1)


def build_rollout(
    env: MpeEnv,
    n_envs: int,
    n_steps: int,
    policy: Callable | None = None,
    return_trajectory: bool = False,
    mesh: Mesh | None = None,
    axis_name: str = "env",
    env_axis: int = 0,
):
    """Build a jitted on-device rollout: ``rollout(key) -> (states, out)``.

    One ``lax.scan`` over ``n_steps`` of the fully vmapped env step — no
    host round-trips anywhere (reset, action sampling/policy, step,
    auto-reset all on device). ``policy(obs, key) -> actions`` defaults to
    uniform-random actions. With ``return_trajectory`` the scan stacks
    (obs, actions, rewards) — the trajectory batch a learner consumes;
    otherwise only summed rewards (cheap bench mode).

    ``env_axis`` picks the batch-axis position for state/obs/action
    tensors. The TPU vector unit tiles the two minor-most dims (8, 128):
    with the default env-leading layout (``env_axis=0``), leaves like
    ``pos[n_envs, E, 2]`` put tiny entity dims in the lanes and waste
    >90% of each tile. ``env_axis=-1`` (env-minor, e.g. ``pos[E, 2,
    n_envs]``) fills the 128-wide lanes with envs — measured >2x faster
    on a v5e chip. Outputs/trajectories follow the same layout.

    With ``mesh``, state and trajectory are sharding-constrained to the
    env axis so XLA partitions every step across devices.
    """
    assert env_axis in (0, -1)
    if mesh is not None:
        def constrain(x):
            ax = 0 if env_axis == 0 else x.ndim - 1
            sh = NamedSharding(
                mesh, P(*([None] * ax), axis_name))
            return jax.lax.with_sharding_constraint(x, sh)
    else:
        def constrain(x):
            return x
    v_reset = jax.vmap(env.reset, in_axes=0, out_axes=env_axis)
    step_ax = (env_axis, env_axis, 0)
    v_step = jax.vmap(env.step, in_axes=step_ax, out_axes=env_axis)

    def rollout(key: jax.Array):
        kr, ks = jax.random.split(key)
        states, obs = v_reset(jax.random.split(kr, n_envs))
        states = jax.tree.map(constrain, states)

        def body(carry, k):
            states, obs = carry
            ka, kstep = jax.random.split(k)
            if policy is None:
                actions = _uniform_actions(env, ka, n_envs, env_axis)
            else:
                actions = policy(obs, ka)
            states, obs, rew, done, _ = v_step(
                states, actions, jax.random.split(kstep, n_envs))
            states = jax.tree.map(constrain, states)
            if return_trajectory:
                out = {"obs": obs, "actions": actions, "reward": rew,
                       "done": done}
            else:
                out = jnp.sum(rew)
            return (states, obs), out

        (states, obs), out = jax.lax.scan(
            body, (states, obs), jax.random.split(ks, n_steps))
        if return_trajectory:
            # trajectory leaves are [T, <step output>]: env axis is 1 for
            # env-leading layout, last for env-minor
            if mesh is not None:
                def traj_constrain(x):
                    ax = 1 if env_axis == 0 else x.ndim - 1
                    sh = NamedSharding(mesh, P(*([None] * ax), axis_name))
                    return jax.lax.with_sharding_constraint(x, sh)
                out = jax.tree.map(traj_constrain, out)
        else:
            out = jnp.sum(out)
        return states, out

    return jax.jit(rollout)


def sharded_rollout(
    env: MpeEnv,
    n_envs: int,
    n_steps: int,
    mesh: Mesh | None = None,
    **kwargs,
):
    """``build_rollout`` over a mesh (defaults to all devices)."""
    mesh = mesh if mesh is not None else env_mesh()
    n_dev = mesh.devices.size
    assert n_envs % n_dev == 0, f"n_envs {n_envs} not divisible by {n_dev} devices"
    return build_rollout(env, n_envs, n_steps, mesh=mesh, **kwargs)


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None,
                   axis_name: str = "env") -> Mesh:
    """Multi-host entry: initialize the JAX distributed runtime (ICI
    within a slice, DCN across hosts) and return the global env mesh.

    Call once per host before building rollouts; combine with
    ``fold_host_key`` for distinct per-host RNG streams. On single-host
    (or under a launcher that sets the cluster env vars) all arguments
    may be omitted. The reference has no multi-process machinery at all
    (SURVEY.md §2.4) — envs shard over every device in the pod and the
    hot path stays collective-free.
    """
    import os

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    cluster_env = any(v in os.environ for v in (
        "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS", "CLOUD_TPU_TASK_ID"))
    if kwargs or cluster_env:
        jax.distributed.initialize(**kwargs)
    # plain single host with nothing specified: initialize() would raise
    # "coordinator_address should be defined" — a one-process run needs
    # no distributed runtime, so just build the local mesh
    return env_mesh(axis_name=axis_name)
