"""Scenario ``simple_world_comm``: the full feature union — a speaking
adversary leader coordinates 3 silent predators chasing 2 prey that can
hide in forests and eat food, around an obstacle.

Capability parity with reference multiagent/scenarios/simple_world_comm.py:
  - world: 6 agents — idx0 leader adversary (non-silent), idx1-3 silent
    adversaries (size .075/accel 3/max_speed 1), idx4-5 good (size .045/
    accel 4/max_speed 1.3); landmark table = [obstacle(.2, collide),
    food0, food1(.03), forest0, forest1(.3)] all appended to
    world.landmarks (:7-53); dim_c=4; landmarks uniform(-0.9, 0.9)
  - good reward (shape=False, :155-183): -5 per adversary collision,
    doubled boundary penalty, +2 per food touch, and the reference's
    quirky **positive** 0.05 * min food distance term (:181)
  - adversary reward (shape=True here, :185-198): -0.1 * min dist to a
    good agent + 5 per (good, any-adversary) collision pair
  - observation (:224-287): per-agent in-forest flags (+1/-1), other
    agents' positions/velocities hidden (zeroed) unless in the same
    forest / both fully outside / observer is the leader; comm is the
    leader's utterance broadcast to everyone (:279). Layouts:
      adversary (incl. leader): [vel2, pos2, ent10, other_pos10,
        other_vel4, in_forest2, leader_comm4] = 34
      good: [vel2, pos2, ent10, other_pos10, in_forest2, other_vel2] = 28
  - benchmark_data: adversary -> good-agent collision count (:115-123)
  - dead code in the reference (set_boundaries :59-85, observation2
    :201-222, prey_forest/prey_forest_lead :263-277) is intentionally not
    reproduced.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mpe_tpu.core.state import make_spec
from mpe_tpu.scenarios import _base as B

N_ADV = 4
N_GOOD = 2
# landmark block layout: [obstacle, food0, food1, forest0, forest1]
FOOD = np.array([1, 2])
FORESTS = np.array([3, 4])


class SimpleWorldCommScenario(B.Scenario):
    per_agent_info = frozenset({"collisions"})
    name = "simple_world_comm"

    def __init__(self):
        self.spec = make_spec(
            "simple_world_comm", n_agents=6, n_landmarks=5,
            agent_collide=True,
            agent_silent=[False] + [True] * 5,
            agent_size=[0.075] * 4 + [0.045] * 2,
            agent_accel=[3.0] * 4 + [4.0] * 2,
            agent_max_speed=[1.0] * 4 + [1.3] * 2,
            adversary=[True] * 4 + [False] * 2,
            leader=[True] + [False] * 5,
            landmark_collide=[True, False, False, False, False],
            landmark_size=[0.2, 0.03, 0.03, 0.3, 0.3],
            dim_c=4,
        )
        self.obs_dims = (34, 34, 34, 34, 28, 28)

    def reset(self, key, dtype=jnp.float32):
        return B.uniform_reset(self.spec, key, dtype, landmark_range=0.9)

    # ------------------------------------------------------------------
    def _entity_collisions(self, state, lmk_indices):
        """[A, K] bool — agent vs selected-landmark ``is_collision``."""
        spec = self.spec
        apos = state.pos[: spec.n_agents]
        lpos = state.pos[spec.n_agents + lmk_indices]
        d = B.pairwise_dist(apos, lpos)
        smin = spec.size[: spec.n_agents, None] + spec.size[
            spec.n_agents + lmk_indices][None, :]
        return d < smin

    def reward(self, state):
        spec = self.spec
        dtype = state.dtype
        col = B.collisions(spec, state)                      # [A, A]
        good_adv_hits = col[N_ADV:, :N_ADV]                  # [good, adv]
        # each (good, adv) colliding pair is worth +5 to every adversary
        pair_hits = good_adv_hits.sum().astype(dtype)
        apos = state.pos[: spec.n_agents]
        d_good_adv = B.pairwise_dist(apos[N_ADV:], apos[:N_ADV])  # [good, adv]
        adv_r = -0.1 * jnp.min(d_good_adv, axis=0) + 5.0 * pair_hits  # [adv]

        # good agents
        hits_per_good = good_adv_hits.sum(axis=1).astype(dtype)  # [good]
        bound = jnp.sum(
            B.bound_penalty(jnp.abs(apos[N_ADV:])), axis=-1)      # [good]
        food_col = self._entity_collisions(state, FOOD)[N_ADV:]   # [good, 2]
        food_d = B.pairwise_dist(
            apos[N_ADV:], state.pos[spec.n_agents + FOOD])         # [good, 2]
        good_r = (
            -5.0 * hits_per_good
            - 2.0 * bound
            + 2.0 * food_col.sum(axis=1).astype(dtype)
            + 0.05 * jnp.min(food_d, axis=1)
        )
        return jnp.concatenate([adv_r, good_r])

    def observation(self, state):
        spec = self.spec
        a = spec.n_agents
        dtype = state.dtype
        lrel = B.landmark_rel(spec, state).reshape(a, -1)     # [A, 10]
        in_forest = self._entity_collisions(state, FORESTS)   # [A, 2] bool
        in_forest_pm = jnp.where(in_forest, 1.0, -1.0).astype(dtype)

        # pairwise visibility (observation :252-261): same forest, or both
        # fully outside every forest, or the observer is the leader
        same_forest = (in_forest[:, None, :] & in_forest[None, :, :]).any(-1)
        outside = ~in_forest.any(-1)                           # [A]
        both_out = outside[:, None] & outside[None, :]
        vis = same_forest | both_out | spec.leader[:, None]    # [A, A]

        oi = spec.others_idx                                   # [A, A-1]
        apos = state.pos[:a]
        avel = state.vel[:a]
        rel = apos[oi] - apos[:, None]                         # [A, A-1, 2]
        vis_o = vis[np.arange(a)[:, None], oi][..., None]      # [A, A-1, 1]
        other_pos = jnp.where(vis_o, rel, 0.0).reshape(a, -1)  # [A, 10]
        other_vel_full = jnp.where(vis_o, avel[oi], 0.0)       # [A, A-1, 2]
        leader_c = state.comm[0]

        rows = []
        for i in range(a):
            # velocities of non-adversary others, in other order (:256-261)
            good_js = [k for k, j in enumerate(oi[i]) if not spec.adversary[j]]
            ovel = other_vel_full[i, jnp.asarray(good_js)].reshape(-1)
            head = [avel[i], apos[i], lrel[i], other_pos[i]]
            if spec.adversary[i]:
                rows.append(jnp.concatenate(
                    head + [ovel, in_forest_pm[i], leader_c]))
            else:
                rows.append(jnp.concatenate(
                    head + [in_forest_pm[i], ovel]))
        return B.pad_stack(rows, self.obs_width)

    def benchmark_data(self, state):
        col = B.collisions(self.spec, state)
        hits = col[:N_ADV, N_ADV:].sum(axis=1).astype(jnp.int32)  # [adv]
        return {"collisions": jnp.concatenate(
            [hits, jnp.zeros((N_GOOD,), jnp.int32)])}

    def entity_colors(self, state):
        colors = (
            [[0.65, 0.15, 0.15]]            # leader adversary (-0.3 grey)
            + [[0.95, 0.45, 0.45]] * 3       # adversaries
            + [[0.45, 0.95, 0.45]] * 2       # good agents
            + [[0.25, 0.25, 0.25]]           # obstacle
            + [[0.15, 0.15, 0.65]] * 2       # food
            + [[0.6, 0.9, 0.6]] * 2          # forests
        )
        return B.const(colors, state.dtype)
