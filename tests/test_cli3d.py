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
