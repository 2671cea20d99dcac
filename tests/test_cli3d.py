"""CLI smoke test for scripts/run_plasma3d.py: checkpoint + resume with
the absolute --steps target semantics (resume continues TOWARD --steps;
the run reports the steps actually executed)."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_plasma3d.py"),
         "--cpu", "--backend", "jnp", "--n", "12", "--nz", "4",
         "--slice-every", "0", *args],
        capture_output=True, text=True, cwd=REPO, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def test_cli3d_checkpoint_resume_step_accounting(tmp_path):
    out = str(tmp_path / "run")
    s = _run("--steps", "3", "--checkpoint-every", "2", "--out", out)
    assert "3 steps" in s
    ck = os.path.join(out, "ckpt_000002.npz")
    assert os.path.exists(ck)
    assert os.path.exists(os.path.join(out, "final_state.npz"))

    # resume from step 2 toward the same absolute target: 1 more step
    s = _run("--steps", "3", "--resume", ck, "--out", out)
    assert "1 steps" in s

    # resume from a checkpoint already AT the target: zero steps, said so
    s = _run("--steps", "3",
             "--resume", os.path.join(out, "final_state.npz"), "--out", out)
    assert "nothing to run" in s
    assert "0 steps" in s


def test_cli3d_shard_flag(tmp_path):
    """--shard N runs the auto-decomposed multi-device step end-to-end
    (2 virtual CPU devices, z-sharded pick at this shape)."""
    out = str(tmp_path / "shrun")
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_plasma3d.py"),
         "--cpu", "--n", "16", "--nz", "4", "--steps", "2", "--shard", "2",
         "--slice-every", "0", "--out", out],
        capture_output=True, text=True, cwd=REPO, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "sharded over mesh {'dz': 2}" in r.stdout
    assert "2 steps" in r.stdout
    assert os.path.exists(os.path.join(out, "final_state.npz"))


def test_cli2d_shard_flag(tmp_path):
    """run_plasma.py --shard N: the 2-D auto picker (1-D dy fused at this
    shape) runs the multi-device step end-to-end from the CLI."""
    out = str(tmp_path / "shrun2d")
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_plasma.py"),
         "--cpu", "--nx", "32", "--ny", "32", "--steps", "2", "--shard", "2",
         "--no-video", "--no-plots", "--checkpoint-every", "2",
         "--out", out],
        capture_output=True, text=True, cwd=REPO, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "sharded over mesh {'dy': 2, 'dx': 1}" in r.stdout
    assert os.path.exists(os.path.join(out, "ckpt_000002.npz"))


def test_cli_cavity_shard_lean(tmp_path):
    """run_cavity.py --shard N --lean: the populations-only sharded
    protocol end-to-end from the CLI (reduced-carry chunk rollouts +
    checkpoint of the materialized state)."""
    out = str(tmp_path / "cavlean")
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_cavity.py"),
         "--cpu", "--nx", "32", "--steps", "4", "--shard", "2", "--lean",
         "--no-video", "--checkpoint-every", "4", "--out", out],
        capture_output=True, text=True, cwd=REPO, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "sharded over mesh" in r.stdout
    assert os.path.exists(os.path.join(out, "final_state.npz"))


def test_cli2d_shard_gspmd_fallback(tmp_path):
    """Bounce-back walls can't use the fused halo protocol: the auto
    picker must fall back to GSPMD instead of failing."""
    out = str(tmp_path / "shrun2d_bb")
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_plasma.py"),
         "--cpu", "--nx", "32", "--ny", "32", "--steps", "2", "--shard", "2",
         "--bc", "bounceback", "--no-video", "--no-plots", "--out", out],
        capture_output=True, text=True, cwd=REPO, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "sharded over mesh" in r.stdout


def test_cli2d_multistep_golden_config(tmp_path):
    """run_plasma.py --multistep K: temporally-blocked windows from the
    CLI at the golden configuration (FFT + periodic — the in-kernel
    spectral solve), f64 interpret on CPU. The final state must match a
    per-step jnp run of the same config at DFT-vs-FFT roundoff, and the
    probe series samples once per window."""
    import numpy as np

    out_ms = str(tmp_path / "ms")
    out_ref = str(tmp_path / "ref")
    common = ["--cpu", "--f64", "--nx", "16", "--ny", "16", "--steps", "11",
              "--no-video", "--no-plots"]
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_plasma.py"),
         *common, "--multistep", "4", "--out", out_ms],
        capture_output=True, text=True, cwd=REPO, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_plasma.py"),
         *common, "--backend", "jnp", "--out", out_ref],
        capture_output=True, text=True, cwd=REPO, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    a = np.load(os.path.join(out_ms, "final_state.npz"))
    b = np.load(os.path.join(out_ref, "final_state.npz"))
    for key in ("f", "g", "Ex", "phi"):
        scale = max(np.abs(b[key]).max(), 1e-300)
        assert np.abs(a[key] - b[key]).max() / scale < 1e-11, key
    # 11 steps / K=4 -> windows at t=0,4,8 -> 3 probe rows (+ header)
    with open(os.path.join(out_ms, "graphs", "ts_rho_e.csv")) as fh:
        assert len(fh.read().strip().splitlines()) == 4


def test_cli2d_multistep_shard_rejects_unaligned_k():
    """--shard N --multistep K is supported (see test_cli2d_multistep_shard)
    but the ghost-slab protocol needs K % 8 == 0 (8-row sublane alignment);
    an unaligned K must fail fast with the contract in the message."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_plasma.py"),
         "--cpu", "--nx", "16", "--ny", "16", "--steps", "4",
         "--multistep", "2", "--shard", "2", "--no-video", "--no-plots"],
        capture_output=True, text=True, cwd=REPO, timeout=120)
    assert r.returncode != 0
    assert "K % 8 == 0" in (r.stderr + r.stdout)


def test_cli2d_multistep_shard(tmp_path):
    """run_plasma.py --shard N --multistep K: the K-deep-ghost windowed
    rollout over the mesh, driven from the CLI (NONE + periodic)."""
    out = str(tmp_path / "shms")
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_plasma.py"),
         "--cpu", "--nx", "16", "--ny", "16", "--steps", "8",
         "--poisson", "NONE", "--multistep", "8", "--shard", "2",
         "--no-video", "--no-plots", "--out", out],
        capture_output=True, text=True, cwd=REPO, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "sharded multistep over mesh {'dy': 2, 'dx': 1}" in r.stdout
    assert os.path.exists(os.path.join(out, "final_state.npz"))


def test_cli_cavity_multistep_shard(tmp_path):
    out = str(tmp_path / "cavshms")
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_cavity.py"),
         "--cpu", "--nx", "16", "--steps", "11", "--multistep", "4",
         "--shard", "2", "--no-video", "--checkpoint-every", "11",
         "--out", out],
        capture_output=True, text=True, cwd=REPO, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "final_state.npz"))
