"""The committed covert-communication checkpoint stays covert.

checkpoints/crypto_pbt_grace_repro_s2_m5.npz is the r5 discovery —
covert communication found from scratch by grace-period population
search (tools/crypto_pbt.py; README crypto section). This test pins the
artifact's three claims so they cannot silently rot: Alice's greedy
codebook is the exact XOR cipher (information-theoretically secure
against an OPTIMAL eavesdropper AND decodable with the key), the
member's trained Bob actually decodes it on rollouts, and blinding
Bob's key pushes him to chance (genuine decryption, not a plaintext
read)."""

import os
import sys

import numpy as np
import pytest

pytest.importorskip("optax")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

CKPT = os.path.join(ROOT, "checkpoints",
                    "crypto_pbt_grace_repro_s2_m5.npz")
CKPT_G0 = os.path.join(ROOT, "checkpoints",
                       "crypto_pbt_grace0_repro_s9_m3.npz")


def _load(path):
    import jax

    from mpe_tpu import scenarios
    from mpe_tpu.envs import MpeEnv
    from mpe_tpu.learner.maddpg import init_maddpg, maddpg_act_dim
    from mpe_tpu.utils.checkpoint import load_checkpoint

    scn = scenarios.load("simple_crypto")
    env = MpeEnv(scn)
    like = {"state": init_maddpg(jax.random.PRNGKey(0), scn.obs_width,
                                 maddpg_act_dim(env), env.n_agents)}
    return scn, load_checkpoint(path, like)[0]["state"]


def test_grace0_protocol_cipher_is_covert():
    """Same pins for an artifact of the BEST protocol (no-grace frozen
    speaker, 7/10 population seeds — README crypto section)."""
    from crypto_study import best_response_errs, eval_seed

    scn, params = _load(CKPT_G0)
    r = eval_seed(scn, params, n_envs=128)
    bob_best, eve_best = best_response_errs(r["alice_codebook"])
    assert bob_best == 0.0 and eve_best == 1.0, r["alice_codebook"]
    assert r["bob_err"] < 0.05, r
    assert r["bob_err_keyless"] > 0.8, r
    assert r["key_changes_msg_frac"] == 1.0, r


def test_committed_cipher_is_covert():
    import jax

    from crypto_study import best_response_errs, eval_seed

    from mpe_tpu import scenarios
    from mpe_tpu.envs import MpeEnv
    from mpe_tpu.learner.maddpg import init_maddpg, maddpg_act_dim
    from mpe_tpu.utils.checkpoint import load_checkpoint

    scn = scenarios.load("simple_crypto")
    env = MpeEnv(scn)
    like = {"state": init_maddpg(jax.random.PRNGKey(0), scn.obs_width,
                                 maddpg_act_dim(env), env.n_agents)}
    payload, _, _ = load_checkpoint(CKPT, like)
    params = payload["state"]
    r = eval_seed(scn, params, n_envs=128)

    # the codebook is the exact XOR cipher: msg = goal ^ key
    assert r["alice_codebook"] == {"goal0_key0": 0, "goal0_key1": 1,
                                   "goal1_key0": 1, "goal1_key1": 0}
    bob_best, eve_best = best_response_errs(r["alice_codebook"])
    assert bob_best == 0.0 and eve_best == 1.0   # decodable + secure

    # the trained decoder works, and only through the key
    assert r["bob_err"] < 0.05, r
    assert r["bob_err_keyless"] > 0.8, r         # chance is 1.0
    assert r["key_changes_msg_frac"] == 1.0, r   # key fully used
