"""Optional window backend (render/window.py): the live-display +
real-key-event path the reference gets from pyglet windows
(rendering.py:46-64, policy.py:21-22).

Headless CI can't open a real window, so these tests force the backend
on (MPE_WINDOW=1) over matplotlib's Agg canvas and synthesize genuine
matplotlib key events through the canvas callback registry — the same
code path a Tk/Qt window drives — asserting the full chain: Viewer
opens a window, frames land in it, InteractivePolicy auto-discovers the
WindowKeySource, and key press/release translate to reference actions.
"""

import numpy as np
import pytest

mpl = pytest.importorskip("matplotlib")
mpl.use("Agg", force=True)


@pytest.fixture()
def forced_window(monkeypatch):
    monkeypatch.setenv("MPE_WINDOW", "1")


def _key_event(fig, name, key):
    from matplotlib.backend_bases import KeyEvent

    KeyEvent(name, fig.canvas, key)._process()


def test_headless_default_no_window(monkeypatch):
    monkeypatch.delenv("MPE_WINDOW", raising=False)
    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.delenv("WAYLAND_DISPLAY", raising=False)
    from mpe_tpu.render import window
    from mpe_tpu.render.raster import Viewer

    assert not window.should_open()
    v = Viewer(100, 100)
    assert v.window is None
    assert v.render(return_rgb_array=True).shape == (100, 100, 3)


def test_rgb_array_render_does_not_open_window(forced_window):
    """The window opens LAZILY: pure rgb_array pipelines (GIF export,
    benchmark loops) never pop a window even when one is available;
    the first human-mode render or key-source request does."""
    from mpe_tpu.render.raster import Viewer

    v = Viewer(100, 100)
    assert v._window is None
    v.render(return_rgb_array=True)
    v.render(return_rgb_array=True)
    assert v._window is None, "rgb_array render opened a window"
    v.render(return_rgb_array=False)     # human path opens it
    assert v._window is not None
    v.close()

    v2 = Viewer(100, 100)
    assert v2.window is not None          # key-source hook opens it
    v2.close()


def test_viewer_opens_window_and_blits(forced_window):
    from mpe_tpu.render.raster import Viewer, make_circle

    v = Viewer(120, 120)
    assert v.window is not None and v.window.isopen
    v.set_bounds(-1, 1, -1, 1)
    geom = make_circle(0.5)
    geom.set_color(1.0, 0.0, 0.0)
    v.add_geom(geom)
    arr = v.render(return_rgb_array=True)
    # the frame must have reached the window's image artist
    shown = np.asarray(v.window._im.get_array())
    assert shown.shape == arr.shape and np.array_equal(shown, arr)
    v.close()
    assert not v.window.isopen


def test_window_key_events_drive_interactive_policy(forced_window):
    from mpe_tpu.factory import make_env
    from mpe_tpu.policy import InteractivePolicy
    from mpe_tpu.render.window import WindowKeySource

    env = make_env("simple", seed=0)
    env.reset()
    env.render("rgb_array")               # lazily creates the viewer
    window = env._viewers[0].window
    assert window is not None

    pol = InteractivePolicy(env, 0)       # auto-discovers the window
    assert isinstance(pol.keys, WindowKeySource)

    # no keys held -> idle one-hot u[0]
    assert np.array_equal(pol.action(None), [1, 0, 0, 0, 0])

    # genuine matplotlib key events (press/release), reference mapping:
    # left->u[1], right->u[2], down->u[3], up->u[4] (policy.py:24-38)
    _key_event(window.fig, "key_press_event", "left")
    assert np.array_equal(pol.action(None), [0, 1, 0, 0, 0])
    _key_event(window.fig, "key_release_event", "left")
    _key_event(window.fig, "key_press_event", "up")
    assert np.array_equal(pol.action(None), [0, 0, 0, 0, 1])
    _key_event(window.fig, "key_release_event", "up")
    assert np.array_equal(pol.action(None), [1, 0, 0, 0, 0])
    # wasd aliases
    _key_event(window.fig, "key_press_event", "d")
    assert np.array_equal(pol.action(None), [0, 0, 1, 0, 0])
    env.close()
