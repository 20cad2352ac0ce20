"""Kernel-dialect scenario blocks for the fused Pallas rollouts.

Each scenario here is the Mosaic-safe, env-minor, scalar-specialized
counterpart of its mpe_tpu.scenarios implementation (which is itself
golden-parity-tested against the reference): no array constants, no
gathers, unrolled entity loops, everything >=2D. The vmapped scenario
path stays the source of truth; interpret-mode tests pin these blocks to
it (tests/test_fused.py).

``generic_physics_block`` implements core.py:117-169 semantics for ANY
``ScenarioSpec``: per-entity scalars (size/mass/accel/max_speed) are
baked at trace time, collide pairs — including agent↔landmark-obstacle
pairs — are unrolled, forces apply only to movable participants, and
non-movable entities pass through untouched.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from mpe_tpu.core.state import ScenarioSpec
from mpe_tpu.ops.fused_rollout import spread_reward_obs_block


def decode_move_block(spec: ScenarioSpec, move):
    """[A, 5, N] one-hots -> scaled force [A, P, N]
    (environment.py:174-181)."""
    a = spec.n_agents
    u = jnp.stack([move[:, 2 * k + 1] - move[:, 2 * k + 2]
                   for k in range(spec.dim_p)], axis=1)
    accel = [float(x) for x in spec.accel]
    mov = [bool(m) for m in spec.movable[:a]]
    if len(set(accel)) == 1 and all(mov):
        return u * accel[0]
    return jnp.stack([u[i] * (accel[i] if mov[i] else 0.0)
                      for i in range(a)])


def generic_physics_block(spec: ScenarioSpec, pos, vel, move):
    """One core.py:117-169 step for any spec: pos/vel [E, P, N],
    move [A, 5, N] -> (pos, vel)."""
    a, e = spec.n_agents, spec.n_entities
    dtype = pos.dtype
    k = float(spec.contact_margin)
    cf = float(spec.contact_force)
    damping = float(spec.damping)
    dt = float(spec.dt)

    u = decode_move_block(spec, move)
    # per-entity force rows; only movable entities accumulate
    rows = [u[i] if spec.movable[i] else None for i in range(a)]
    rows += [None] * (e - a)
    for i in range(e):
        for j in range(i + 1, e):
            if not (spec.collide[i] and spec.collide[j]):
                continue
            if not (spec.movable[i] or spec.movable[j]):
                continue
            delta = pos[i] - pos[j]                          # [P, N]
            d2 = jnp.sum(jnp.square(delta), axis=0, keepdims=True)
            # rsqrt + multiplies instead of sqrt + divide (see
            # spread_physics_block)
            inv = jax.lax.rsqrt(jnp.maximum(d2, float(jnp.finfo(dtype).tiny)))
            dist = d2 * inv
            dmin = float(spec.size[i] + spec.size[j])
            pen = jnp.logaddexp(jnp.zeros((), dtype), -(dist - dmin) / k) * k
            f = (cf * pen) * inv * delta
            if spec.movable[i]:
                rows[i] = f if rows[i] is None else rows[i] + f
            if spec.movable[j]:
                rows[j] = -f if rows[j] is None else rows[j] - f

    # integrate movable entities (damping before force, clamp, then pos)
    new_pos, new_vel = [], []
    for i in range(e):
        if not spec.movable[i]:
            new_pos.append(pos[i])
            new_vel.append(vel[i])
            continue
        force = rows[i]
        v = vel[i] * (1.0 - damping)
        if force is not None:
            v = v + force * (dt / float(spec.initial_mass[i]))
        ms = float(spec.max_speed[i])
        if np.isfinite(ms):
            s2 = jnp.sum(jnp.square(v), axis=0, keepdims=True)
            inv_s = jax.lax.rsqrt(jnp.maximum(s2, float(jnp.finfo(dtype).tiny)))
            v = jnp.where(s2 > ms * ms, v * (ms * inv_s), v)
        new_vel.append(v)
        new_pos.append(pos[i] + v * dt)
    return jnp.stack(new_pos), jnp.stack(new_vel)


def color_rows_by_goal(goal_row, colors, n, dtype):
    """[3, N] RGB rows of ``colors[goal]`` per lane (unrolled select)."""
    return jnp.concatenate(
        [select_by_goal(goal_row,
                        [jnp.full((1, n), colors[j][ch], dtype)
                         for j in range(len(colors))])
         for ch in range(3)], axis=0)


class KernelScenario:
    """Blocks consumed by the generic fused rollout. ``reward_obs``
    returns (reward rows [R, N] — R=1 for shared-reward scenarios, else
    A — and obs [A, obs_w, N])."""

    spec: ScenarioSpec
    obs_w: int
    reward_rows: int
    goal_choices: tuple = ()     # per-goal number of landmark choices
    uses_comm: bool = False      # any non-silent agent (comm in obs)

    def reset_ranges(self) -> tuple[float, float]:
        """(agent_range, landmark_range) for uniform position sampling."""
        return 1.0, 1.0

    MIN_MXU_PAIRS = 4

    def prepare(self, dtype):
        """Loop-invariant kernel constants (the iota/where-built gather/
        scatter matrices). Kernels MUST call this once BEFORE their step
        loop and thread the result through ``physics``/``reward_obs`` —
        Mosaic does not hoist the construction chains out of
        ``fori_loop`` (measured ~30% of world_comm's step when rebuilt
        per iteration). Subclasses extend the dict."""
        from mpe_tpu.ops.mxu_physics import mxu_physics_prep

        return {"phys": mxu_physics_prep(self.spec, dtype,
                                         self.MIN_MXU_PAIRS)}

    def physics(self, pos, vel, move, prep=None):
        """MXU-packed pair physics (ops/mxu_physics: pair deltas and
        force scatter as +-1 matmuls, sublane-packed transcendentals;
        world_comm +20%, tag +15% — PERF.md). Falls back to the unrolled
        ``generic_physics_block`` below 4 collide pairs: the same-process
        A/B (tools/kernel_ablate.py) shows spread's 3 pairs run ~5%
        FASTER unrolled — building the scatter/gather matrices costs more
        than packing three pairs saves — while tag (14 pairs) and
        world_comm (21) gain 15-20% packed."""
        from mpe_tpu.ops.mxu_physics import mxu_physics_block

        return mxu_physics_block(self.spec, pos, vel, move,
                                 min_pairs=self.MIN_MXU_PAIRS,
                                 prep=None if prep is None
                                 else prep.get("phys"))

    def reward_obs(self, pos, vel, comm=None, goal=None, prep=None):
        raise NotImplementedError


class KernelSimple(KernelScenario):
    """simple: reward -dist^2 to the landmark; obs [vel, landmark_rel]
    (reference simple.py:41-50)."""

    def __init__(self, spec: ScenarioSpec):
        self.spec = spec
        self.obs_w = 4
        self.reward_rows = 1

    def reward_obs(self, pos, vel, comm=None, goal=None, prep=None):
        rel = pos[1] - pos[0]                                # [P, N]
        rew = -jnp.sum(jnp.square(rel), axis=0, keepdims=True)
        obs = jnp.concatenate([vel[0], rel], axis=0)[None]   # [1, 4, N]
        return rew, obs


class KernelSpread(KernelScenario):
    """simple_spread (see fused_rollout.spread_reward_obs_block)."""

    def __init__(self, spec: ScenarioSpec):
        self.spec = spec
        self.obs_w = 18
        self.reward_rows = 1

    def reward_obs(self, pos, vel, comm=None, goal=None, prep=None):
        a = self.spec.n_agents
        return spread_reward_obs_block(self.spec, pos[:a], vel[:a], pos[a:])


class KernelTag(KernelScenario):
    """simple_tag: 3 predators + 1 prey, collide obstacle landmarks,
    bound penalty (reference simple_tag.py:89-147)."""

    def __init__(self, spec: ScenarioSpec):
        self.spec = spec
        self.obs_w = 16
        self.reward_rows = spec.n_agents

    def reset_ranges(self):
        return 1.0, 0.9                                      # simple_tag.py:47-52

    def reward_obs(self, pos, vel, comm=None, goal=None, prep=None):
        spec = self.spec
        a, l = spec.n_agents, spec.n_landmarks
        dtype = pos.dtype
        n = pos.shape[-1]
        prey = a - 1

        # predator-prey collisions (post-step positions)
        hits = jnp.zeros((1, n), dtype)
        for i in range(prey):
            d2 = jnp.sum(jnp.square(pos[i] - pos[prey]), axis=0,
                         keepdims=True)
            thresh2 = float(spec.size[i] + spec.size[prey]) ** 2
            hits = hits + (d2 < thresh2).astype(dtype)
        adv_r = 10.0 * hits                                  # [1, N]

        # prey: -10/hit - bound penalty per dim (simple_tag.py:103-113)
        bound = jnp.zeros((1, n), dtype)
        for d in range(spec.dim_p):
            x = jnp.abs(pos[prey, d : d + 1])
            pen = jnp.where(
                x < 0.9, jnp.zeros((), dtype),
                jnp.where(x < 1.0, (x - 0.9) * 10.0,
                          jnp.minimum(jnp.exp(2.0 * x - 2.0), 10.0)))
            bound = bound + pen
        prey_r = -10.0 * hits - bound
        rew = jnp.concatenate([adv_r, adv_r, adv_r, prey_r], axis=0)

        # obs: [vel(2), pos(2), L rel(4), others rel(6), prey vel(2 or pad)]
        obs_rows = []
        for i in range(a):
            parts = [vel[i], pos[i]]
            for j in range(l):
                parts.append(pos[a + j] - pos[i])
            for j in range(a):
                if j != i:
                    parts.append(pos[j] - pos[i])
            if i != prey:
                parts.append(vel[prey])
            else:
                parts.append(jnp.zeros((2, n), dtype))       # pad to 16
            obs_rows.append(jnp.concatenate(parts, axis=0))
        return rew, jnp.stack(obs_rows)




# ---------------------------------------------------------------------------
# goal / comm helpers
# ---------------------------------------------------------------------------

def select_by_goal(goal_row, values):
    """Unrolled gather: goal_row [1, N] int32, values[j] -> [.., N] rows;
    returns values[goal] per lane (Mosaic-safe: no gather op)."""
    out = values[0]
    for j in range(1, len(values)):
        out = jnp.where(goal_row == j, values[j], out)
    return out


def const_rows(vals, n, dtype):
    """[len(vals), N] of per-row scalar constants."""
    return jnp.concatenate(
        [jnp.full((1, n), float(v), dtype) for v in vals], axis=0)


def onehot_rows(goal_row, width, dtype):
    """[width, N] one-hot of a [1, N] int index (unrolled)."""
    return jnp.concatenate(
        [(goal_row == j).astype(dtype) for j in range(width)], axis=0)


class KernelAdversary(KernelScenario):
    """simple_adversary (shaped rewards; reference simple_adversary.py:
    82-139). Goals: 1 of 2 landmarks."""

    def __init__(self, spec: ScenarioSpec):
        self.spec = spec
        self.obs_w = 10
        self.reward_rows = 3
        self.goal_choices = (2,)

    def reward_obs(self, pos, vel, comm=None, goal=None, prep=None):
        n = pos.shape[-1]
        gpos = select_by_goal(goal[0:1], [pos[3], pos[4]])    # [P, N]
        d = []
        for i in range(3):
            d.append(jnp.sqrt(jnp.sum(jnp.square(pos[i] - gpos), axis=0,
                                      keepdims=True)))        # [1, N]
        adv_r = -jnp.square(d[0])
        good_r = -jnp.minimum(d[1], d[2]) + d[0]
        rew = jnp.concatenate([adv_r, good_r, good_r], axis=0)

        rows = []
        for i in range(3):
            parts = []
            if i != 0:
                parts.append(gpos - pos[i])                   # goal rel
            for j in (3, 4):
                parts.append(pos[j] - pos[i])                 # landmark rel
            for j in range(3):
                if j != i:
                    parts.append(pos[j] - pos[i])             # other rel
            if i == 0:
                parts.append(jnp.zeros((2, n), pos.dtype))    # pad 8 -> 10
            rows.append(jnp.concatenate(parts, axis=0))
        return rew, jnp.stack(rows)


class KernelPush(KernelScenario):
    """simple_push (reference simple_push.py:62-96)."""

    PUSH_LANDMARK_COLORS = (0.1, 0.9, 0.1, 0.1, 0.1, 0.9)

    def __init__(self, spec: ScenarioSpec):
        self.spec = spec
        self.obs_w = 19
        self.reward_rows = 2
        self.goal_choices = (2,)

    def reward_obs(self, pos, vel, comm=None, goal=None, prep=None):
        dtype = pos.dtype
        n = pos.shape[-1]
        g = goal[0:1]
        gpos = select_by_goal(g, [pos[2], pos[3]])
        d0 = jnp.sqrt(jnp.sum(jnp.square(pos[0] - gpos), axis=0,
                              keepdims=True))
        d1 = jnp.sqrt(jnp.sum(jnp.square(pos[1] - gpos), axis=0,
                              keepdims=True))
        rew = jnp.concatenate([d1 - d0, -d1], axis=0)

        # good agent's own color: 0.25 grey + 0.5 on channel goal+1
        own = [jnp.full((1, n), 0.25, dtype),
               jnp.full((1, n), 0.25, dtype) + 0.5 * (g == 0).astype(dtype),
               jnp.full((1, n), 0.25, dtype) + 0.5 * (g == 1).astype(dtype)]
        adv = jnp.concatenate(
            [vel[0], pos[2] - pos[0], pos[3] - pos[0], pos[1] - pos[0],
             jnp.zeros((11, n), dtype)], axis=0)
        good = jnp.concatenate(
            [vel[1], gpos - pos[1]] + own
            + [pos[2] - pos[1], pos[3] - pos[1],
               const_rows(self.PUSH_LANDMARK_COLORS, n, dtype),
               pos[0] - pos[1]], axis=0)
        return rew, jnp.stack([adv, good])


class KernelReference(KernelScenario):
    """simple_reference (collaborative; reference simple_reference.py:
    55-80). Returns the post-broadcast shared reward [1, N]."""

    LMK_COLORS = ((0.75, 0.25, 0.25), (0.25, 0.75, 0.25), (0.25, 0.25, 0.75))

    def __init__(self, spec: ScenarioSpec):
        self.spec = spec
        self.obs_w = 21
        self.reward_rows = 1
        self.goal_choices = (3, 3)
        self.uses_comm = True

    def reward_obs(self, pos, vel, comm=None, goal=None, prep=None):
        dtype = pos.dtype
        n = pos.shape[-1]
        lpos = [pos[2], pos[3], pos[4]]
        shared = jnp.zeros((1, n), dtype)
        for i, other in ((0, 1), (1, 0)):
            gpos = select_by_goal(goal[i : i + 1], lpos)
            shared = shared - jnp.sum(jnp.square(pos[other] - gpos), axis=0,
                                      keepdims=True)
        rows = []
        for i, other in ((0, 1), (1, 0)):
            color_rows = color_rows_by_goal(
                goal[i : i + 1], self.LMK_COLORS, n, dtype)
            parts = [vel[i]]
            for j in (2, 3, 4):
                parts.append(pos[j] - pos[i])
            parts.append(color_rows)
            parts.append(comm[other])                         # other's comm
            rows.append(jnp.concatenate(parts, axis=0))
        return shared, jnp.stack(rows)


class KernelSpeakerListener(KernelScenario):
    """simple_speaker_listener (collaborative; reference :63-92)."""

    LMK_COLORS = ((0.65, 0.15, 0.15), (0.15, 0.65, 0.15), (0.15, 0.15, 0.65))

    def __init__(self, spec: ScenarioSpec):
        self.spec = spec
        self.obs_w = 11
        self.reward_rows = 1
        self.goal_choices = (3,)
        self.uses_comm = True

    def reward_obs(self, pos, vel, comm=None, goal=None, prep=None):
        dtype = pos.dtype
        n = pos.shape[-1]
        g = goal[0:1]
        lpos = [pos[2], pos[3], pos[4]]
        gpos = select_by_goal(g, lpos)
        d2 = jnp.sum(jnp.square(pos[1] - gpos), axis=0, keepdims=True)
        shared = -2.0 * d2                                     # sum of 2 agents

        color_rows = color_rows_by_goal(g, self.LMK_COLORS, n, dtype)
        speaker = jnp.concatenate(
            [color_rows, jnp.zeros((8, n), dtype)], axis=0)    # pad 3 -> 11
        listener = jnp.concatenate(
            [vel[1], pos[2] - pos[1], pos[3] - pos[1], pos[4] - pos[1],
             comm[0]], axis=0)
        return shared, jnp.stack([speaker, listener])


class KernelCrypto(KernelScenario):
    """simple_crypto (comm-only; reference simple_crypto.py:97-169)."""

    def __init__(self, spec: ScenarioSpec):
        self.spec = spec
        self.obs_w = 8
        self.reward_rows = 3
        self.goal_choices = (2, 2)
        self.uses_comm = True

    def reward_obs(self, pos, vel, comm=None, goal=None, prep=None):
        dtype = pos.dtype
        dc = self.spec.dim_c
        goal_color = onehot_rows(goal[0:1], dc, dtype)         # [4, N]
        key_color = onehot_rows(goal[1:2], dc, dtype)
        eve_c, bob_c, alice_c = comm[0], comm[1], comm[2]

        def guarded(c):
            nz = jnp.zeros_like(c[0:1])
            for r in range(dc):
                nz = jnp.maximum(nz, (c[r : r + 1] != 0).astype(dtype))
            err = jnp.sum(jnp.square(c - goal_color), axis=0, keepdims=True)
            return nz * err

        good = -guarded(bob_c) + guarded(eve_c)
        eve = -guarded(eve_c)
        rew = jnp.concatenate([eve, good, good], axis=0)

        n = pos.shape[-1]
        pad4 = jnp.zeros((4, n), dtype)
        rows = [
            jnp.concatenate([alice_c, pad4], axis=0),          # eve
            jnp.concatenate([key_color, alice_c], axis=0),     # bob
            jnp.concatenate([goal_color, key_color], axis=0),  # alice
        ]
        return rew, jnp.stack(rows)


class KernelWorldComm(KernelScenario):
    """simple_world_comm — the full feature union (reference
    simple_world_comm.py:155-287): leader comm broadcast, forest
    visibility masking, food rewards, obstacle collisions. Landmark
    block layout: [obstacle, food0, food1, forest0, forest1]."""

    N_ADV, N_GOOD = 4, 2
    FOOD = (1, 2)
    FORESTS = (3, 4)
    # Matmul obs assembly measured SLOWER than row-wise even with the
    # gather matrices prebuilt (212 vs 314 M steps/s on hardware,
    # tools/kernel_ablate.py --variants rowwise_obs,mxu_obs): unlike the
    # physics, obs rows need per-pair visibility masks and a 34-row
    # concat around the matmul outputs, and those relayouts cost more
    # than the row subtracts saved. Kept selectable for the A/B.
    MXU_OBS = False

    def __init__(self, spec: ScenarioSpec):
        self.spec = spec
        self.obs_w = 34
        self.reward_rows = 6
        self.uses_comm = True

    def reset_ranges(self):
        return 1.0, 0.9

    def reward_obs(self, pos, vel, comm=None, goal=None, prep=None):
        spec = self.spec
        a = spec.n_agents
        dtype = pos.dtype
        n = pos.shape[-1]
        na, ng = self.N_ADV, self.N_GOOD

        # All pairwise quantities run on SQUARED distances: thresholds
        # (collisions, food touch, forest membership) compare squares —
        # zero transcendentals — and min-distance reward terms take ONE
        # sqrt after the min (sqrt is monotonic and correctly rounded, so
        # sqrt(min d2) == min sqrt(d2) element-for-element). This cut the
        # block from 24 sqrts/step to 6 (see PERF.md).
        def d2(i, j):
            return jnp.sum(jnp.square(pos[i] - pos[j]), axis=0,
                           keepdims=True)                     # [1, N]

        # squared good x adversary distances and pair collisions
        d2_ga = {(g, v): d2(na + g, v) for g in range(ng) for v in range(na)}
        hit_ga = {
            k: (d < float(spec.size[na + k[0]] + spec.size[k[1]]) ** 2)
            for k, d in d2_ga.items()
        }
        pair_hits = jnp.zeros((1, n), dtype)
        for h in hit_ga.values():
            pair_hits = pair_hits + h.astype(dtype)

        # adversary rewards: -0.1 * min over good of dist + 5 * pair_hits
        adv_rows = []
        for v in range(na):
            dmin2 = d2_ga[(0, v)]
            for g in range(1, ng):
                dmin2 = jnp.minimum(dmin2, d2_ga[(g, v)])
            adv_rows.append(-0.1 * jnp.sqrt(dmin2) + 5.0 * pair_hits)

        # good rewards: -5/adv hit, -2*bound, +2/food touch, +0.05*min food d
        good_rows = []
        for g in range(ng):
            i = na + g
            hits = jnp.zeros((1, n), dtype)
            for v in range(na):
                hits = hits + hit_ga[(g, v)].astype(dtype)
            bound = jnp.zeros((1, n), dtype)
            for d_ in range(spec.dim_p):
                x = jnp.abs(pos[i, d_ : d_ + 1])
                pen = jnp.where(
                    x < 0.9, jnp.zeros((), dtype),
                    jnp.where(x < 1.0, (x - 0.9) * 10.0,
                              jnp.minimum(jnp.exp(2.0 * x - 2.0), 10.0)))
                bound = bound + pen
            food_touch = jnp.zeros((1, n), dtype)
            food_dmin2 = None
            for f in self.FOOD:
                df2 = d2(i, a + f)
                food_touch = food_touch + (
                    df2 < float(spec.size[i] + spec.size[a + f]) ** 2
                ).astype(dtype)
                food_dmin2 = df2 if food_dmin2 is None else jnp.minimum(
                    food_dmin2, df2)
            good_rows.append(-5.0 * hits - 2.0 * bound + 2.0 * food_touch
                             + 0.05 * jnp.sqrt(food_dmin2))
        rew = jnp.concatenate(adv_rows + good_rows, axis=0)   # [6, N]

        # forest membership / visibility (simple_world_comm.py:231-261)
        in_f = {}
        for i in range(a):
            for fi, f in enumerate(self.FORESTS):
                in_f[(i, fi)] = d2(i, a + f) < float(
                    spec.size[i] + spec.size[a + f]) ** 2
        outside = {
            i: jnp.logical_not(in_f[(i, 0)] | in_f[(i, 1)]) for i in range(a)
        }

        def visible(i, j):
            if spec.leader[i]:
                return None                                   # always visible
            same = (in_f[(i, 0)] & in_f[(j, 0)]) | (in_f[(i, 1)] & in_f[(j, 1)])
            return same | (outside[i] & outside[j])

        leader_c = comm[0]                                    # [4, N]
        if self.MXU_OBS:
            obs = self._obs_mxu(pos, vel, in_f, visible, leader_c, prep)
        else:
            obs = self._obs_rowwise(pos, vel, in_f, visible, leader_c)
        return rew, obs

    def _obs_matrix_rows(self):
        """Per-agent (u_rows, rel_rows, ovel_rows) sparse entries over
        the packed state [pos_flat(2E); agent vels(2A)]."""
        spec = self.spec
        a, e, p = spec.n_agents, spec.n_entities, spec.dim_p
        pr = lambda ent, d: p * ent + d
        vr = lambda ag, d: p * e + p * ag + d
        per_agent = []
        for i in range(a):
            u_rows = ([{vr(i, d): 1.0} for d in range(p)]
                      + [{pr(i, d): 1.0} for d in range(p)])
            for f in range(spec.n_landmarks):
                u_rows += [{pr(a + f, d): 1.0, pr(i, d): -1.0}
                           for d in range(p)]
            others = [j for j in range(a) if j != i]
            rel_rows = [{pr(j, d): 1.0, pr(i, d): -1.0}
                        for j in others for d in range(p)]
            goods = [j for j in others if not spec.adversary[j]]
            ovel_rows = [{vr(j, d): 1.0} for j in goods for d in range(p)]
            per_agent.append((u_rows, rel_rows, ovel_rows))
        return per_agent

    def prepare(self, dtype):
        from mpe_tpu.ops.mxu_physics import entries_matrix

        prep = super().prepare(dtype)
        if self.MXU_OBS:
            spec = self.spec
            width = spec.dim_p * (spec.n_entities + spec.n_agents)
            prep["obs"] = [
                tuple(entries_matrix(rows, len(rows), width, dtype)
                      for rows in agent_rows)
                for agent_rows in self._obs_matrix_rows()
            ]
        return prep

    def _obs_rowwise(self, pos, vel, in_f, visible, leader_c):
        """Row-at-a-time obs assembly (one [P, N] subtract + where per
        entity pair). Kept for the A/B in tools/kernel_ablate.py."""
        spec = self.spec
        a = spec.n_agents
        dtype = pos.dtype
        n = pos.shape[-1]
        rows = []
        for i in range(a):
            parts = [vel[i], pos[i]]
            for f in range(spec.n_landmarks):
                parts.append(pos[a + f] - pos[i])
            ovel = []
            for j in range(a):
                if j == i:
                    continue
                v_mask = visible(i, j)
                rel = pos[j] - pos[i]
                if v_mask is not None:
                    rel = jnp.where(v_mask, rel, 0.0)
                parts.append(rel)
                if not spec.adversary[j]:
                    vj = vel[j]
                    if v_mask is not None:
                        vj = jnp.where(v_mask, vj, 0.0)
                    ovel.append(vj)
            forest_pm = jnp.concatenate(
                [jnp.where(in_f[(i, fi)], 1.0, -1.0).astype(dtype)
                 for fi in range(2)], axis=0)
            if spec.adversary[i]:
                parts += ovel + [forest_pm, leader_c]
            else:
                # good rows are 28-d; pad to the 34-d obs width
                parts += [forest_pm] + ovel + [jnp.zeros((6, n), dtype)]
            rows.append(jnp.concatenate(parts, axis=0))
        return jnp.stack(rows)

    def _obs_mxu(self, pos, vel, in_f, visible, leader_c, prep=None):
        """Matmul obs assembly: every linear row (own vel/pos, landmark
        rel, other-agent rel, other vel) comes out of a per-agent ±1
        matmul over the packed state [pos_flat; agent vels] — the same
        MXU gather trick as ops/mxu_physics — and forest visibility is
        applied as ONE sublane-packed multiply per masked block instead
        of a where per pair-row. ±1 entries at HIGHEST precision are
        exact, so values are bit-identical to the row-wise form. The
        matrices come prebuilt in ``prep["obs"]`` (see ``prepare`` —
        rebuilding them per step measured SLOWER than the row-wise
        form)."""
        from mpe_tpu.ops.mxu_physics import entries_matrix

        hi = jax.lax.Precision.HIGHEST
        spec = self.spec
        a = spec.n_agents
        e = spec.n_entities
        p = spec.dim_p
        dtype = pos.dtype
        n = pos.shape[-1]
        width = p * e + p * a

        S = jnp.concatenate([pos[k] for k in range(e)]
                            + [vel[k] for k in range(a)], axis=0)
        if prep is not None and "obs" in prep:
            mats = prep["obs"]
        else:
            mats = [tuple(entries_matrix(rows, len(rows), width, dtype)
                          for rows in agent_rows)
                    for agent_rows in self._obs_matrix_rows()]

        rows_out = []
        for i in range(a):
            u_m, rel_m, ovel_m = mats[i]
            u = jnp.dot(u_m, S, precision=hi)                # [14, N]
            rel = jnp.dot(rel_m, S, precision=hi)            # [10, N]
            ovel = jnp.dot(ovel_m, S, precision=hi)
            others = [j for j in range(a) if j != i]
            goods = [j for j in others if not spec.adversary[j]]

            if not spec.leader[i]:
                vis = {j: visible(i, j).astype(dtype) for j in others}
                rel = rel * jnp.concatenate(
                    [vis[j] for j in others for _ in range(p)], axis=0)
                ovel = ovel * jnp.concatenate(
                    [vis[j] for j in goods for _ in range(p)], axis=0)

            forest_pm = jnp.concatenate(
                [jnp.where(in_f[(i, fi)], 1.0, -1.0).astype(dtype)
                 for fi in range(2)], axis=0)
            if spec.adversary[i]:
                parts = [u, rel, ovel, forest_pm, leader_c]
            else:
                parts = [u, rel, forest_pm, ovel,
                         jnp.zeros((6, n), dtype)]
            rows_out.append(jnp.concatenate(parts, axis=0))
        return jnp.stack(rows_out)


_KERNEL_SCENARIOS = {
    "simple": KernelSimple,
    "simple_spread": KernelSpread,
    "simple_tag": KernelTag,
    "simple_adversary": KernelAdversary,
    "simple_push": KernelPush,
    "simple_reference": KernelReference,
    "simple_speaker_listener": KernelSpeakerListener,
    "simple_crypto": KernelCrypto,
    "simple_world_comm": KernelWorldComm,
}


def kernel_scenario(name_or_scenario) -> KernelScenario:
    """Kernel blocks for a scenario (by name or scenario instance).

    This is the single chokepoint every fused builder (fused_rollout /
    fused_policy / fused_trajectory / fused_maddpg) resolves scenarios
    through, so spec features the kernels do NOT implement are rejected
    here instead of silently dropped: action/comm noise (reference
    core.py:132-140, 171-177 — none of the 9 built-in scenarios sets
    them) and the scripted-agent ``action_callback`` hook (core.py:79,
    117-120). Both are fully supported by the vmapped XLA engine
    (envs/functional.py:75-96)."""
    if isinstance(name_or_scenario, str):
        from mpe_tpu import scenarios as registry

        scn = registry.load(name_or_scenario)
    else:
        scn = name_or_scenario
    name = scn.spec.name
    if name not in _KERNEL_SCENARIOS:
        raise KeyError(
            f"no fused kernel for {name!r}; available: "
            f"{sorted(_KERNEL_SCENARIOS)} (the vmapped XLA path in "
            f"mpe_tpu.parallel supports every scenario)")
    if np.any(scn.spec.u_noise) or np.any(scn.spec.c_noise):
        raise NotImplementedError(
            f"scenario {name!r} sets u_noise/c_noise, which the fused "
            "Pallas kernels do not implement — use the vmapped XLA "
            "engine (mpe_tpu.envs.MpeEnv / mpe_tpu.parallel), which "
            "reproduces the reference noise semantics exactly "
            "(tests/test_noise_parity.py)")
    from mpe_tpu.scenarios._base import Scenario as _Base

    if type(scn).scripted_action is not _Base.scripted_action:
        raise NotImplementedError(
            f"scenario {name!r} overrides scripted_action (the "
            "reference's action_callback path), which the fused Pallas "
            "kernels do not implement — use the vmapped XLA engine "
            "(envs/functional.py:83-96)")
    return _KERNEL_SCENARIOS[name](scn.spec)
