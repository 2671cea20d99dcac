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


def test_checkpoint_layout_metadata(tmp_path):
    """Layout metadata round-trips; pre-metadata files report empty meta."""
    cfg = dataclasses.replace(PlasmaConfig(), NX=8, NY=8, dtype=jnp.float64)
    state = plasma.init_state(cfg)
    path = str(tmp_path / "ck.npz")
    ckpt.save(path, state, neutral_delta=True, storage="native")
    assert ckpt.load_meta(path) == {"neutral_delta": True,
                                    "storage": "native"}
    # metadata keys must not leak into the restored state
    back = ckpt.load(path)
    for a, b in zip(state, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    legacy = str(tmp_path / "legacy.npz")
    ckpt.save(legacy, state)
    assert ckpt.load_meta(legacy) == {}


def test_reconcile_pre_metadata_raises_catchable(tmp_path):
    """A pre-metadata checkpoint must raise a catchable ValueError (not
    SystemExit — library callers can't handle that), and assume_layout
    must unblock it."""
    import pytest

    cfg = dataclasses.replace(PlasmaConfig(), NX=8, NY=8,
                              dtype=jnp.float64, neutral_delta=False)
    state = plasma.init_state(cfg)
    legacy = str(tmp_path / "legacy.npz")
    ckpt.save(legacy, state)  # no metadata
    with pytest.raises(ValueError, match="assume_layout"):
        ckpt.reconcile_resumed_state(ckpt.load(legacy), legacy, cfg)
    back = ckpt.reconcile_resumed_state(ckpt.load(legacy), legacy, cfg,
                                        assume_layout="classic")
    np.testing.assert_array_equal(np.asarray(back.f), np.asarray(state.f))


def test_checkpoint_neutral_layout_conversion(tmp_path):
    """classic <-> delta conversion is exact at storage precision and
    inverts itself (the advisor's resume-corruption scenario)."""
    cfg = dataclasses.replace(PlasmaConfig(), NX=10, NY=10,
                              dtype=jnp.float64, neutral_delta=False)
    state = plasma.init_state(cfg)
    state = jax.jit(plasma.make_step(cfg))(state)
    rho_n_ref = cfg.units().rho_n_init

    delta = ckpt.convert_neutral_layout(state, to_delta=True,
                                        rho_n_ref=rho_n_ref)
    # classic -> delta subtracts exactly the uniform background
    from lbm_tpu.constants import D2Q9
    bg = np.asarray(D2Q9.W)[:, None, None] * rho_n_ref
    np.testing.assert_allclose(np.asarray(delta.f[2]),
                               np.asarray(state.f[2]) - bg, rtol=1e-15)
    # e/i species and g untouched
    np.testing.assert_array_equal(np.asarray(delta.f[:2]),
                                  np.asarray(state.f[:2]))
    np.testing.assert_array_equal(np.asarray(delta.g), np.asarray(state.g))
    # round trip is exact in f64
    back = ckpt.convert_neutral_layout(delta, to_delta=False,
                                       rho_n_ref=rho_n_ref)
    np.testing.assert_array_equal(np.asarray(back.f), np.asarray(state.f))

    # converted state must produce the same dynamics as a native delta run
    dcfg = dataclasses.replace(cfg, neutral_delta=True)
    s_native = plasma.init_state(dcfg)
    s_native = jax.jit(plasma.make_step(dcfg))(s_native)
    s_conv = jax.jit(plasma.make_step(dcfg))(
        ckpt.convert_neutral_layout(
            plasma.init_state(cfg), to_delta=True, rho_n_ref=rho_n_ref))
    for a, b in zip(s_native, s_conv):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-20)


def test_checkpoint_bf16_explicit_dtype_upcasts(tmp_path):
    """load(path, dtype=...) honors an explicit dtype for bf16-tagged
    arrays (keeps bf16 only when dtype=None)."""
    cfg = dataclasses.replace(PlasmaConfig(), NX=8, NY=8,
                              dtype=jnp.float32, storage="bf16",
                              neutral_delta=True)
    state = plasma.init_state(cfg)
    path = str(tmp_path / "ck_bf16.npz")
    ckpt.save(path, state, neutral_delta=True, storage="bf16")
    stays = ckpt.load(path)
    assert stays.f.dtype == jnp.bfloat16
    up = ckpt.load(path, dtype=jnp.float64)
    assert up.f.dtype == jnp.float64 and up.Ex.dtype == jnp.float64
    np.testing.assert_array_equal(np.asarray(up.f, dtype=np.float32),
                                  np.asarray(stays.f, dtype=np.float32))


def test_checkpoint3d_roundtrip(tmp_path):
    """Plasma3DState npz round-trip incl. bf16 bit-tagging + metadata."""
    from lbm_tpu.models import plasma3d

    cfg = dataclasses.replace(PlasmaConfig(), NX=12, NY=12, NZ=4,
                              dtype=jnp.float32, storage="bf16",
                              neutral_delta=True)
    s = plasma3d.init_state(cfg)
    path = str(tmp_path / "c3.npz")
    ckpt.save3d(path, s, neutral_delta=True, storage="bf16")
    assert ckpt.load_meta(path) == {"neutral_delta": True, "storage": "bf16"}
    b = ckpt.load3d(path)
    assert b.f.dtype == jnp.bfloat16
    for x, y in zip(s, b):
        np.testing.assert_array_equal(np.asarray(x, np.float32),
                                      np.asarray(y, np.float32))
    # layout conversion works on the 3-D (D3Q19) stack too
    c = ckpt.convert_neutral_layout(b, to_delta=False,
                                    rho_n_ref=cfg.units().rho_n_init)
    from lbm_tpu.constants import D3Q19
    bg = (np.asarray(D3Q19.W)[:, None, None, None]
          * cfg.units().rho_n_init).astype(np.float32)
    # single f64 -> bf16 rounding, matching convert_neutral_layout
    want = (np.asarray(b.f[2], np.float64) + bg).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(c.f[2], np.float32),
                                  want.astype(np.float32))


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
    """Per-stage dump in the C++ debug build's format (all 5 stages)."""
    from lbm_tpu.models import plasma_staged

    cfg = dataclasses.replace(PlasmaConfig(), NX=8, NY=8, dtype=jnp.float64)
    state = plasma.init_state(cfg)
    path = str(tmp_path / "dump.txt")
    d = debug_dump.DebugDumper(cfg, path)
    assert d.enabled
    staged = plasma_staged.make_staged_step(cfg)
    feq = plasma_staged.init_feq(cfg)
    state, feq, stages = staged(state, feq)
    for st in plasma_staged.STAGES:
        d.dump_stage(0, st, stages[st])
    d.close()
    text = open(path).read()
    assert text.startswith("# Debug dump per LBmethod\n")
    for st in plasma_staged.STAGES:
        assert f"stage = {st}\n" in text
    assert "directions arrangement:\n6,2,5\n3,0,1\n7,4,8\n" in text
    assert "f_eq_n_i dir 8 (cx=1,cy=-1)" in text
    # 5 stages x (10 scalars + 2 E + 12 population sets x 9 dirs)
    assert text.count("rho_q\n") == 5
    assert text.count(" dir ") == 5 * 12 * 9
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


def test_cavity_checkpoint_roundtrip(tmp_path):
    from lbm_tpu.config import CavityConfig
    from lbm_tpu.models import cavity

    cfg = CavityConfig(NX=24, NY=24, nsteps=30, dtype=jnp.float32)
    s = jax.jit(cavity.make_rollout(cfg))(cavity.init_state(cfg))
    path = str(tmp_path / "cav.npz")
    ckpt.save_cavity(path, s, storage=cfg.storage)
    assert ckpt.load_meta(path)["storage"] == "native"
    s2 = ckpt.load_cavity(path)
    for a, b in zip(s, s2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cavity_checkpoint_bf16_reconcile(tmp_path):
    """bf16 cavity checkpoints round-trip bit-exactly and convert to the
    native layout (and back) via the encode/decode pair."""
    from lbm_tpu.config import CavityConfig
    from lbm_tpu.models import cavity

    cfg = CavityConfig(NX=24, NY=24, nsteps=30, storage="bf16")
    s = jax.jit(cavity.make_rollout(cfg))(cavity.init_state(cfg))
    path = str(tmp_path / "cav_bf16.npz")
    ckpt.save_cavity(path, s, storage="bf16")

    # same-layout resume: bit-exact
    s2 = ckpt.reconcile_cavity_state(ckpt.load_cavity(path), path, cfg)
    assert s2.f.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(s.f, np.float32), np.asarray(s2.f, np.float32))

    # cross-layout resume: bf16 ckpt into a native config decodes f
    cfg_native = dataclasses.replace(cfg, storage="native")
    s3 = ckpt.reconcile_cavity_state(ckpt.load_cavity(path), path,
                                     cfg_native)
    assert s3.f.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(s3.f),
                               np.asarray(cavity.decode_f(cfg, s.f)),
                               rtol=0, atol=0)

    # native ckpt into a bf16 config encodes (one bf16 rounding)
    path_n = str(tmp_path / "cav_native.npz")
    ckpt.save_cavity(path_n, s3, storage="native")
    s4 = ckpt.reconcile_cavity_state(ckpt.load_cavity(path_n), path_n, cfg)
    assert s4.f.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(s4.f, np.float32), np.asarray(s.f, np.float32))


def test_cavity_checkpoint_bf16_into_f64_run(tmp_path):
    """A bf16 cavity checkpoint must resume into an f64 NATIVE run (the
    cross-layout decode used to build a storage-swapped config copy whose
    validation rejects bf16+f64)."""
    from lbm_tpu.config import CavityConfig
    from lbm_tpu.models import cavity

    cfg = CavityConfig(NX=24, NY=24, nsteps=20, storage="bf16")
    s = jax.jit(cavity.make_rollout(cfg))(cavity.init_state(cfg))
    path = str(tmp_path / "cav_bf16.npz")
    ckpt.save_cavity(path, s, storage="bf16")

    cfg64 = CavityConfig(NX=24, NY=24, nsteps=20, dtype=jnp.float64)
    s64 = ckpt.reconcile_cavity_state(ckpt.load_cavity(path), path, cfg64)
    assert s64.f.dtype == jnp.float64
    np.testing.assert_allclose(
        np.asarray(s64.f, np.float32),
        np.asarray(cavity.decode_f(cfg, s.f)), rtol=0, atol=0)
    # and the resumed state steps cleanly
    s65 = jax.jit(cavity.make_step(cfg64))(s64)
    assert np.isfinite(np.asarray(s65.f)).all()


def test_cavity_orbax_roundtrip(tmp_path):
    from lbm_tpu.config import CavityConfig
    from lbm_tpu.models import cavity

    cfg = CavityConfig(NX=16, NY=16, nsteps=5)
    s = jax.jit(cavity.make_rollout(cfg))(cavity.init_state(cfg))
    path = str(tmp_path / "cav_orbax")
    ckpt.save_orbax(path, s)
    back = ckpt.load_orbax(path, template=s,
                           state_cls=cavity.CavityState)
    for a, b in zip(s, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_golden_videos_match_reference():
    """Frame-by-frame comparison of the committed golden videos vs the
    reference's committed run (scripts/compare_golden_videos.py): both are
    fps=1 renders of the 200^2/200 golden configuration with identical
    fixed color ranges, so the 200 frames align 1:1. Gates: every tile
    >= 95% of pixels within 2 JET bands; PSNR floors catch gross breakage
    (wrong range / flip / trajectory)."""
    import os
    import sys

    import pytest

    pytest.importorskip("cv2")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ours = os.path.join(here, "artifacts/golden_200/video")
    ref = "/root/reference/build/video_200x200_200TS"
    if not (os.path.isdir(ours) and os.path.isdir(ref)):
        pytest.skip("golden videos not available")
    sys.path.insert(0, os.path.join(here, "scripts"))
    try:
        import compare_golden_videos as cgv
    finally:
        sys.path.pop(0)
    results = cgv.compare(ours, ref)
    fails = cgv.gates(results)
    assert not fails, fails
