#!/usr/bin/env python
"""Render a TRAINED MADDPG policy to an animated GIF (headless).

Loads a checkpoint written by examples/maddpg_run.py / train.py --save,
rolls greedy (argmax) episodes through the stateful env, and writes the
frames via the NumPy rasterizer — e.g. watch the trained
speaker/listener pair navigate by communication:

    python examples/render_policy.py --scenario simple_speaker_listener \
        --checkpoint checkpoints/maddpg_speaker_listener.npz \
        --out docs/media/speaker_listener_trained.gif
"""
import argparse
import os
import sys

sys.path.insert(1, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenario", default="simple_speaker_listener")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--episodes", type=int, default=3)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mute-comm", action="store_true",
                    help="zero the comm head (the ablation, visibly "
                         "worse on comm scenarios)")
    ap.add_argument("--platform", default="cpu",
                    help="rendering rollouts are host-side; cpu default")
    args = ap.parse_args()
    import jax

    jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from mpe_tpu import factory
    from mpe_tpu.learner.maddpg import (actor_logits_i, init_maddpg,
                                        maddpg_act_dim)
    from mpe_tpu.render.video import record_episode, save_gif
    from mpe_tpu.utils.checkpoint import load_checkpoint

    env = factory.make_env(args.scenario, seed=args.seed)
    spec = env.world_spec
    mw = 2 * spec.dim_p + 1
    from mpe_tpu.envs.functional import MpeEnv

    fenv = MpeEnv(env.scenario)
    aw = maddpg_act_dim(fenv)
    like = init_maddpg(jax.random.PRNGKey(0), env.scenario.obs_width, aw,
                       spec.n_agents)
    payload, step, _ = load_checkpoint(args.checkpoint, {"state": like})
    params = payload["state"]
    cw = aw - mw

    def policy(obs_n):
        """Greedy ragged reference-format actions from the per-agent
        actors (move one-hot iff movable, comm one-hot iff speaking)."""
        acts = []
        ow = env.scenario.obs_width
        for i in range(spec.n_agents):
            ap_i = jax.tree.map(lambda x: x[i], params["actor"])
            # actors train on width-padded obs rows (trailing zeros)
            o = np.zeros(ow, np.float32)
            o[: len(obs_n[i])] = np.asarray(obs_n[i], np.float32)
            logits = np.asarray(actor_logits_i(ap_i, jnp.asarray(o)))
            segs = []
            if spec.movable[i]:
                mv = np.zeros(mw)
                mv[int(np.argmax(logits[:mw]))] = 1.0
                segs.append(mv)
            if not spec.silent[i]:
                cm = np.zeros(spec.dim_c)
                if cw and not args.mute_comm:
                    cm[int(np.argmax(logits[mw:]))] = 1.0
                segs.append(cm)
            acts.append(np.concatenate(segs))
        return acts

    frames = []
    for ep in range(args.episodes):
        frames += record_episode(env, n_steps=args.steps, policy=policy)
        env.reset()
    save_gif(frames, args.out)
    print(f"{len(frames)} frames (ckpt step {step}) -> {args.out}")


if __name__ == "__main__":
    main()
