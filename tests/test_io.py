"""Observability subsystem tests: colormap, AVI writer, probes, checkpoint,
timing CSV, debug dump."""
import dataclasses
import os
import struct

import jax
import jax.numpy as jnp
import numpy as np

from lbm_tpu.config import PlasmaConfig
from lbm_tpu.io import checkpoint as ckpt
from lbm_tpu.io import colormap, debug_dump, probes, timing
from lbm_tpu.models import plasma


def test_jet_colormap_endpoints():
    v = jnp.array([0.0, 0.25, 0.5, 0.75, 1.0])
    rgb = np.asarray(colormap.jet(v))
    assert rgb.shape == (5, 3)
    assert rgb[0, 2] > 100 and rgb[0, 0] == 0       # cold end: blue
    assert rgb[2, 1] == 255                          # middle: green
    assert rgb[4, 0] > 100 and rgb[4, 2] == 0        # hot end: red
    # out-of-range values clip, not wrap
    over = np.asarray(colormap.jet(jnp.array([2.0, -1.0])))
    np.testing.assert_array_equal(over[0], rgb[4])
    np.testing.assert_array_equal(over[1], rgb[0])
    # palette-index path reproduces JET up to 8-bit quantization
    idx = np.asarray(colormap.jet_index(v))
    diff = colormap.JET_PALETTE[idx].astype(int) - rgb.astype(int)
    assert np.abs(diff).max() <= 2


def test_frames_shapes():
    NY, NX = 12, 16
    z = jnp.zeros((NY, NX))
    d = colormap.density_frame(z, z, z)
    v = colormap.velocity_frame(z, z, z, z)
    t = colormap.temperature_frame(z, z, z)
    assert d.shape == (NY, 3 * NX)       # palette-index frames
    assert v.shape == (2 * NY, 3 * NX)
    assert t.shape == (NY, 3 * NX)
    assert d.dtype == jnp.uint8


def test_avi_writer_roundtrip(tmp_path):
    from lbm_tpu.io import avi

    if not avi.available():
        import pytest
        pytest.skip("native aviwriter not buildable here")
    path = str(tmp_path / "test.avi")
    w, h, n = 32, 20, 5
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(n, h, w, 3), dtype=np.uint8)
    with avi.AviWriter(path, w, h, fps=2) as vw:
        for fr in frames:
            vw.write(fr)
    data = open(path, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    # RIFF size covers the file
    riff_size = struct.unpack("<I", data[4:8])[0]
    assert riff_size == len(data) - 8
    assert data.count(b"00db") == 2 * n  # movi chunks + idx1 entries
    # first frame payload: bottom-up BGR of frames[0]
    movi = data.index(b"movi")
    first = data.index(b"00db", movi)
    size = struct.unpack("<I", data[first + 4:first + 8])[0]
    payload = np.frombuffer(data[first + 8:first + 8 + size], np.uint8)
    row = w * 3
    padded = (row + 3) & ~3
    got = payload.reshape(h, padded)[:, :row].reshape(h, w, 3)
    expect = frames[0][::-1, :, ::-1]  # vertical flip + RGB->BGR
    np.testing.assert_array_equal(got, expect)


def test_probe_points_match_reference_layout():
    xs, ys = probes.probe_points(200, 200)
    assert (xs[0], ys[0]) == (100, 100)
    assert set(zip(xs.tolist(), ys.tolist())) == {
        (100, 100), (150, 100), (50, 100), (100, 150), (100, 50),
        (150, 150), (150, 50), (50, 150), (50, 50)}


def test_probe_recorder_and_sample():
    cfg = dataclasses.replace(PlasmaConfig(), NX=16, NY=16, dtype=jnp.float64)
    state = plasma.init_state(cfg)
    step = jax.jit(plasma.make_step(cfg))
    rec = probes.ProbeRecorder(cfg.NX, cfg.NY)
    for _ in range(3):
        state = step(state)
        mac = plasma.compute_macros(cfg, state)
        rec.record(mac, state.Ex, state.Ey)
    arrs = rec.as_arrays()
    assert set(arrs) == set(probes.QUANTITIES)
    assert len(probes.QUANTITIES) == 19
    assert arrs["rho_e"].shape == (3, 9)
    # center probe sits inside the seeded box: nonzero electron density
    assert arrs["rho_e"][0, 0] > 0


def test_checkpoint_roundtrip(tmp_path):
    cfg = dataclasses.replace(PlasmaConfig(), NX=12, NY=12, dtype=jnp.float64)
    state = plasma.init_state(cfg)
    state = jax.jit(plasma.make_step(cfg))(state)
    path = str(tmp_path / "ck.npz")
    ckpt.save(path, state)
    back = ckpt.load(path)
    for a, b in zip(state, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(back.step) == 1


def test_timing_csv(tmp_path):
    path = str(tmp_path / "t.csv")
    timing.append_timing_csv(path, NX=200, NY=200, nsteps=100, n_devices=8,
                             poisson=3, bc=0, wall_ms=1234.5)
    timing.append_timing_csv(path, NX=64, NY=64, nsteps=10, n_devices=1,
                             poisson=0, bc=1, wall_ms=9.9)
    lines = open(path).read().strip().split("\n")
    assert lines[0] == timing.CSV_HEADER.strip()
    assert lines[1] == "200x200,100,8,3,0,1234"  # rounded ms, reference schema
    assert lines[2] == "64x64,10,1,0,1,10"


def test_debug_dump(tmp_path):
    cfg = dataclasses.replace(PlasmaConfig(), NX=8, NY=8, dtype=jnp.float64)
    state = plasma.init_state(cfg)
    path = str(tmp_path / "dump.txt")
    d = debug_dump.DebugDumper(cfg, path)
    assert d.enabled
    d.dump(0, "macro", state)
    d.dump(0, "poisson", state)
    d.close()
    text = open(path).read()
    assert "==== step 0 stage macro ====" in text
    assert "-- ux_e --" in text and "-- rho_q --" in text
    # large grids are gated off like the reference (NX < 11)
    big = debug_dump.DebugDumper(
        dataclasses.replace(cfg, NX=64), str(tmp_path / "n.txt"))
    assert not big.enabled


def test_checkpoint_orbax_roundtrip(tmp_path):
    cfg = dataclasses.replace(PlasmaConfig(), NX=8, NY=8, dtype=jnp.float64)
    state = plasma.init_state(cfg)
    path = str(tmp_path / "ck_orbax")
    ckpt.save_orbax(path, state)
    back = ckpt.load_orbax(path, template=state)
    for a, b in zip(state, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
