"""Watchdog and video-fallback tests."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbm_tpu.config import PlasmaConfig
from lbm_tpu.models import plasma
from lbm_tpu.utils import watchdog


def _state(with_nan=False):
    cfg = dataclasses.replace(PlasmaConfig(), NX=8, NY=8, dtype=jnp.float64)
    s = plasma.init_state(cfg)
    if with_nan:
        s = s._replace(f=s.f.at[0, 0, 0, 0].set(jnp.nan))
    return s


def test_state_is_finite():
    assert watchdog.state_is_finite(_state())
    assert not watchdog.state_is_finite(_state(with_nan=True))


def test_watchdog_raises():
    wd = watchdog.Watchdog(every=1)
    good = _state()
    assert wd.check(0, good) is good
    with pytest.raises(watchdog.BlowupError):
        wd.check(1, _state(with_nan=True))


def test_watchdog_rollback():
    wd = watchdog.Watchdog(every=1, keep_snapshot=True, on_blowup="rollback")
    good = _state()
    wd.check(0, good)
    back = wd.check(1, _state(with_nan=True))
    np.testing.assert_array_equal(np.asarray(back.f), np.asarray(good.f))


def test_watchdog_cadence():
    wd = watchdog.Watchdog(every=10)
    bad = _state(with_nan=True)
    # off-cadence steps are not checked
    assert wd.check(0, bad) is bad
    with pytest.raises(watchdog.BlowupError):
        wd.check(9, bad)  # (9+1) % 10 == 0


def test_gif_fallback_writer(tmp_path):
    from lbm_tpu.io.video import _GifBackend

    path = str(tmp_path / "v.avi")
    b = _GifBackend(path, fps=2)
    rng = np.random.default_rng(0)
    for _ in range(3):
        b.write(rng.integers(0, 255, (8, 12, 3), dtype=np.uint8))
    b.close()
    gif = tmp_path / "v.gif"
    assert gif.exists()
    from PIL import Image

    img = Image.open(gif)
    assert img.n_frames == 3
