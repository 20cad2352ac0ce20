"""Rendering + interactive-policy layer tests (reference rendering.py /
policy.py / bin/interactive.py equivalents)."""

import subprocess
import sys

import numpy as np

from mpe_tpu import make_env
from mpe_tpu.policy import InteractivePolicy, RandomPolicy, ScriptedKeySource
from mpe_tpu.render import comm_transcript, make_circle, Viewer, Transform


def test_render_rgb_array_shapes_and_colors():
    env = make_env("simple_spread", seed=0)
    env.reset()
    frames = env.render("rgb_array")
    assert len(frames) == 1  # shared viewer
    assert frames[0].shape == (700, 700, 3) and frames[0].dtype == np.uint8
    # agents + landmarks drawn: frame is not all-white
    assert (frames[0] < 250).any()


def test_render_per_agent_viewers():
    env = make_env("simple_adversary", seed=1, shared_viewer=False)
    env.reset()
    frames = env.render("rgb_array")
    assert len(frames) == env.n
    # per-agent cameras center on different positions -> frames differ
    assert any((frames[0] != f).any() for f in frames[1:])


def test_render_geoms_rebuilt_after_reset():
    env = make_env("simple", seed=0)
    env.reset()
    env.render("rgb_array")
    assert env._render_geoms is not None
    env.reset()  # reference _reset_render drops cached geoms (env.py:195-197)
    assert env._render_geoms is None


def test_comm_transcript():
    env = make_env("simple_reference", seed=0)
    env.reset()
    comm = np.zeros((2, 10))
    msg = comm_transcript(env.world_spec, comm)
    assert "agent 0 to agent 1: _" in msg
    comm[0, 3] = 1.0
    assert "agent 0 to agent 1: d" in comm_transcript(env.world_spec, comm)


def test_viewer_draws_circle():
    v = Viewer(64, 64)
    geom = make_circle(0.5)
    geom.set_color(1.0, 0.0, 0.0)
    geom.add_attr(Transform(translation=(0.0, 0.0)))
    v.add_geom(geom)
    arr = v.render(return_rgb_array=True)
    assert arr.shape == (64, 64, 3)
    center = arr[32, 32]
    assert center[0] > 200 and center[1] < 100  # red disk at center


def test_interactive_policy_reference_key_conventions():
    env = make_env("simple", seed=0)
    # one key per step: right, up, nothing (reference policy.py:32-39:
    # left->u[1], right->u[2], down->u[3], up->u[4])
    pol = InteractivePolicy(env, 0, ScriptedKeySource(["right", "up", []]))
    a1 = pol.action(None)
    np.testing.assert_array_equal(a1, [0, 0, 1, 0, 0])
    a2 = pol.action(None)
    np.testing.assert_array_equal(a2, [0, 0, 0, 0, 1])
    a3 = pol.action(None)
    np.testing.assert_array_equal(a3, [1, 0, 0, 0, 0])  # idle -> u[0]


def test_interactive_policy_steps_env():
    env = make_env("simple_spread", seed=0)
    obs_n = env.reset()
    pols = [InteractivePolicy(env, i, ScriptedKeySource([["left"]] * 3))
            for i in range(env.n)]
    acts = [p.action(obs_n[i]) for i, p in enumerate(pols)]
    obs_n, rew_n, done_n, _ = env.step(acts)
    assert len(obs_n) == 3 and np.isfinite(rew_n).all()


def test_random_policy_all_scenarios():
    from mpe_tpu import scenarios as registry

    for name in registry.names():
        env = make_env(name, seed=0)
        obs_n = env.reset()
        pols = [RandomPolicy(env, i, seed=3) for i in range(env.n)]
        for _ in range(2):
            acts = [p.action(obs_n[i]) for i, p in enumerate(pols)]
            obs_n, rew_n, done_n, _ = env.step(acts)
        assert np.isfinite(rew_n).all(), name


def test_interactive_cli_headless():
    out = subprocess.run(
        [sys.executable, "bin/interactive.py", "--scenario", "simple.py",
         "--steps", "2", "--headless", "--platform", "cpu"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-800:]
    assert "t=1 rewards=" in out.stdout


def test_record_gif(tmp_path):
    from mpe_tpu.render.video import record_gif

    path = record_gif("simple_tag", str(tmp_path / "tag.gif"), n_steps=4)
    import os
    assert os.path.getsize(path) > 1000
    from PIL import Image
    im = Image.open(path)
    assert im.n_frames == 4


def test_render_golden_frame_spread():
    """Pixel-pinned regression for the full render path: camera bounds
    (±1 around origin, environment.py:247-256), circle tessellation,
    agent alpha-0.5 compositing (environment.py:230-236), landmark
    colors. The golden PNG was produced by this exact pipeline; any
    drift in bounds math, rasterization, or color handling shows up as
    a pixel diff."""
    from PIL import Image as PILImage

    env = make_env("simple_spread", seed=0)
    env.reset()
    frame = env.render("rgb_array")[0]
    golden = np.asarray(PILImage.open("tests/golden/spread_frame.png"))
    assert frame.shape == golden.shape == (700, 700, 3)
    np.testing.assert_array_equal(frame, golden)

    # alpha compositing invariant: agent center = 0.5*color + 0.5*white
    pos = np.asarray(env.state.pos)
    cx = int((pos[0, 0] + 1.0) / 2.0 * 700)
    cy = int((1.0 - pos[0, 1]) / 2.0 * 700)
    expect = 0.5 * np.array([0.35, 0.35, 0.85]) * 255 + 0.5 * 255
    assert np.abs(frame[cy, cx] - expect).max() <= 1.0


def test_raster_full_reference_surface():
    """The five surface pieces the reference has beyond the basic geoms:
    Point, Compound, LineStyle, LineWidth, get_display
    (rendering.py:32, 201-279)."""
    import pytest
    from mpe_tpu.render import (
        Compound, Line, LineStyle, LineWidth, Point, Transform, Viewer,
        get_display, make_capsule, make_circle)

    # get_display: None passthrough, string handle, invalid -> error
    assert get_display(None) is None
    assert "0" in repr(get_display(":0"))
    with pytest.raises(ValueError):
        get_display(42)

    v = Viewer(64, 64)
    # Point: a dot at the transform origin
    pt = Point()
    pt.set_color(1.0, 0.0, 0.0)
    pt.add_attr(Transform(translation=(0.5, 0.5)))
    v.add_geom(pt)
    frame = v.render(return_rgb_array=True)
    px = frame[int((1 - 0.5) / 2 * 64), int((0.5 + 1) / 2 * 64)]
    assert px[0] > 200 and px[1] < 100

    # LineWidth/LineStyle attrs: stippled line lights fewer pixels than
    # a solid one of the same width
    def drawn(pattern):
        vv = Viewer(64, 64)
        ln = Line((-0.9, 0.0), (0.9, 0.0))
        ln.add_attr(LineWidth(3.0))
        if pattern is not None:
            ln.add_attr(LineStyle(pattern))
        vv.add_geom(ln)
        return (vv.render(return_rgb_array=True) < 250).any(-1).sum()

    solid, dashed = drawn(None), drawn(0x00FF)
    assert 0 < dashed < solid

    # Compound: children take the compound's color (their own is
    # stripped, rendering.py:271-273) and the compound's transform
    # composes outside the child's own
    c0 = make_circle(0.2)
    c0.set_color(0.0, 1.0, 0.0)          # stripped by Compound
    comp = Compound([c0])
    comp.set_color(0.0, 0.0, 1.0)
    comp.add_attr(Transform(translation=(-0.5, -0.5)))
    v2 = Viewer(64, 64)
    v2.add_geom(comp)
    f2 = v2.render(return_rgb_array=True)
    center = f2[int((1 + 0.5) / 2 * 64), int((-0.5 + 1) / 2 * 64)]
    assert center[2] > 200 and center[1] < 100  # blue, not green

    # make_capsule is now the reference's Compound construction
    assert isinstance(make_capsule(0.4, 0.1), Compound)


def test_raster_geometry_coverage():
    """Line/PolyLine/capsule/Image/SimpleImageViewer paths of the raster
    layer (reference rendering.py:243-345 surface)."""
    from mpe_tpu.render import (
        Image, Line, SimpleImageViewer, Transform, Viewer, make_capsule,
        make_polyline)

    v = Viewer(64, 64)
    v.add_geom(Line((-0.5, 0.0), (0.5, 0.0)).add_attr(Transform()))
    pl = make_polyline([(-0.5, -0.5), (0.0, 0.5), (0.5, -0.5)])
    pl.set_linewidth(2.0)
    v.add_geom(pl)
    cap = make_capsule(0.4, 0.1)
    cap.set_color(0.2, 0.2, 0.9)
    v.add_geom(cap)
    img = np.zeros((8, 8, 3), np.uint8)
    img[:, :, 0] = 255
    v.add_geom(Image(img, 0.4, 0.4).add_attr(
        Transform(translation=(-0.6, -0.6))))
    frame = v.render(return_rgb_array=True)
    assert frame.shape == (64, 64, 3)
    assert (frame < 250).any()          # something was drawn

    siv = SimpleImageViewer()
    siv.imshow(frame)
    assert siv.isopen and siv.last_frame.shape == (64, 64, 3)
    siv.close()

    # one-shot draw helpers clear after render (rendering.py:114-135)
    v.draw_circle(0.2, color=(1.0, 0.0, 0.0))
    v.render()
    assert v.onetime_geoms == []


def test_blit_offcanvas_crops_not_squashes():
    """A partially off-canvas image is CROPPED at the viewport (the
    reference GL quad clips): on-canvas pixels come from the visible
    part of the texture, not the whole texture compressed into the
    sliver."""
    from mpe_tpu.render.raster import Canvas

    c = Canvas(10, 10)          # world bounds [-1, 1]^2
    img = np.zeros((2, 10, 3), np.float64)
    img[:, :5] = [1.0, 0.0, 0.0]            # left half red
    img[:, 5:] = [0.0, 0.0, 1.0]            # right half blue
    # image spans x in [-3, 1]: the left (red) half is entirely
    # off-canvas; only the right (blue) half lands on screen
    c.blit([(-3.0, -0.2), (1.0, 0.2)], img)
    visible = c.buf[4:6, :, :]               # the blitted rows
    drawn = visible[np.any(visible != 1.0, axis=-1)]
    assert len(drawn) > 0
    assert (drawn[:, 2] > 0.9).all() and (drawn[:, 0] < 0.1).all()


def test_checkpoint_rejects_structure_mismatch(tmp_path):
    """Equal leaf COUNT with different structure must raise, not
    silently misassign (renamed/reordered fields change flatten order)."""
    import pytest

    from mpe_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, {"alpha": np.ones(2), "beta": np.zeros(3)})
    with pytest.raises(ValueError, match="structure mismatch"):
        load_checkpoint(p, {"state": {"beta2": np.zeros(3),
                                      "alpha2": np.ones(2)}})
