"""Driver-harness helpers: bench extras rotation + video gate profiles.

Pure-function tests — no device work. These guard the round-5
driver-proofing logic: the extras rotation must never lose a key, and
the f64 video gate profile must be strictly tighter than the f32 one.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_prior_extra_keys_reads_numeric_only(tmp_path):
    import bench

    rec = {"parsed": {"metric": "m", "value": 1.0,
                      "extra": {"a": 12.5, "b": "skipped: budget",
                                "c": "error: X", "d": 3}}}
    (tmp_path / "BENCH_r01.json").write_text(json.dumps(rec))
    # a corrupt record must be skipped, not fatal
    (tmp_path / "BENCH_r02.json").write_text("{not json")
    # a record with no parsed line (failed round)
    (tmp_path / "BENCH_r03.json").write_text(json.dumps({"rc": 124}))
    seen = bench._prior_extra_keys(str(tmp_path))
    assert seen == {"a", "d"}


def test_prior_extra_keys_empty_dir(tmp_path):
    import bench

    assert bench._prior_extra_keys(str(tmp_path)) == set()


def test_rotate_jobs_never_drops_and_interleaves():
    import bench

    jobs = [
        ("p1", "plasma", None, None),
        ("p2", "plasma", None, None),
        ("c1", "cavity", None, None),
        ("m1", "plasma_ms", None, None),
        ("d1", "3d", None, None),
        ("x1", "mystery_family", None, None),  # unknown tag: must survive
    ]
    out = bench._rotate_jobs(jobs, seen=set())
    assert sorted(j[0] for j in out) == sorted(j[0] for j in jobs)
    # interleave: the four known families lead, one each
    assert [j[0] for j in out][:4] == ["c1", "m1", "d1", "p1"]

    # seen keys sink to the tail in original order
    out = bench._rotate_jobs(jobs, seen={"c1", "p1"})
    keys = [j[0] for j in out]
    assert keys[-2:] == ["p1", "c1"]
    assert set(keys) == {j[0] for j in jobs}

    # flagship keys lead even when seen; nothing is lost
    out = bench._rotate_jobs(jobs, seen={"c1", "p1"}, flagship=("p1",))
    keys = [j[0] for j in out]
    assert keys[0] == "p1"
    assert keys[-1] == "c1"
    assert set(keys) == {j[0] for j in jobs}


def test_video_gate_profiles():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import compare_golden_videos as cgv

    # f64 (chaos-free trajectories) must be strictly tighter than f32
    for i in range(3):
        assert cgv.GATES["f64"][i] >= cgv.GATES["f32"][i]
    assert cgv.GATES["f64"] != cgv.GATES["f32"]

    results = {"density": {
        "frames": 200,
        "tiles": {"rho_e": {"psnr_mean": 24.0, "psnr_min": 16.0,
                            "close_frac_mean": 0.952}},
    }}
    # passes the loose f32 profile, fails the tight f64 one
    assert cgv.gates(results, "f32") == []
    fails = cgv.gates(results, "f64")
    assert len(fails) == 3


def test_committed_video_compare_artifacts_pass_their_gates():
    """The committed f32 and f64 comparison JSONs must satisfy the gate
    profiles they were recorded under (a gate tightened past the
    committed evidence would be a silent lie)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import compare_golden_videos as cgv

    root = os.path.join(os.path.dirname(__file__), "..",
                        "artifacts", "golden_200")
    with open(os.path.join(root, "video_compare.json")) as fh:
        f32 = json.load(fh)
    assert cgv.gates(f32["results"], "f32") == []
    with open(os.path.join(root, "video_compare_f64.json")) as fh:
        f64 = json.load(fh)
    assert f64.get("gate_profile") == "f64"
    assert cgv.gates(f64["results"], "f64") == []
