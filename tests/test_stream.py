"""Streaming operators vs. the oracle's push loops; conservation checks."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from lbm_tpu.config import BC, PlasmaConfig
from lbm_tpu.ops.stream import stream_bounceback, stream_cavity, stream_periodic

import oracle


def test_periodic_matches_oracle():
    rng = np.random.default_rng(2)
    NY, NX = 6, 10
    f = rng.random((9, NY, NX))
    mine = np.asarray(stream_periodic(jnp.asarray(f)))
    ref = oracle.Oracle.stream_one(f, periodic=True)
    np.testing.assert_array_equal(mine, ref)


def test_bounceback_matches_oracle():
    rng = np.random.default_rng(3)
    for NY, NX in [(5, 5), (6, 9), (8, 7)]:
        f = rng.random((9, NY, NX))
        stale = rng.random((9, NY, NX))
        mine = np.asarray(
            stream_bounceback(jnp.asarray(f), stale=jnp.asarray(stale)))
        ref = oracle.Oracle.stream_one(f, periodic=False, stale=stale)
        np.testing.assert_array_equal(mine, ref)


def test_streaming_conserves_mass_periodic():
    rng = np.random.default_rng(4)
    f = jnp.asarray(rng.random((9, 12, 12)))
    assert abs(float(stream_periodic(f).sum() - f.sum())) < 1e-12


def test_bounceback_corner_quirk():
    """The reference's corner handling triple-writes one inward-diagonal slot
    per corner and leaves two slots holding stale buffer values; mass is NOT
    exactly conserved there. Verify hole slots carry the stale array."""
    rng = np.random.default_rng(5)
    f = rng.random((9, 6, 6))
    stale = rng.random((9, 6, 6))
    out = np.asarray(stream_bounceback(jnp.asarray(f), stale=jnp.asarray(stale)))
    # holes at the four corners (e.g. direction 6 at (0,0), direction 8 at
    # (0,0)) retain the stale values
    assert out[6, 0, 0] == stale[6, 0, 0]
    assert out[8, 0, 0] == stale[8, 0, 0]
    assert out[5, 0, -1] == stale[5, 0, -1]
    assert out[7, 0, -1] == stale[7, 0, -1]


def test_cavity_stream_zero_lid_conserves_mass():
    rng = np.random.default_rng(6)
    f = jnp.asarray(rng.random((9, 8, 8)))
    out = stream_cavity(f, 0.0)
    assert abs(float(out.sum() - f.sum())) / float(f.sum()) < 1e-14


def test_cavity_stream_interior_is_pull():
    rng = np.random.default_rng(7)
    NY = NX = 6
    f = rng.random((9, NY, NX))
    out = np.asarray(stream_cavity(jnp.asarray(f), 0.123))
    cx, cy = oracle.CX, oracle.CY
    for i in range(9):
        for y in range(1, NY - 1):
            for x in range(1, NX - 1):
                assert out[i, y, x] == f[i, y - cy[i], x - cx[i]]


def test_bounceback_fixup_matches_gather_oracle():
    """The slice-fixup bounce-back (periodic + edge corrections) must match
    the flat-gather transliteration of the reference's write loop exactly,
    including corner write-order winners and stale holes."""
    from lbm_tpu.ops import stream as S

    rng = np.random.default_rng(21)
    for (NY, NX) in [(8, 8), (8, 16), (12, 20), (16, 8), (9, 11)]:
        f = rng.standard_normal((9, NY, NX))
        stale = rng.standard_normal((9, NY, NX))
        ref = np.asarray(S.stream_bounceback_gather(jnp.asarray(f),
                                                    stale=jnp.asarray(stale)))
        got = np.asarray(S.stream_bounceback(jnp.asarray(f),
                                             stale=jnp.asarray(stale)))
        np.testing.assert_array_equal(got, ref, err_msg=f"{NY}x{NX}")
        # batched (species) axis too
        fb = rng.standard_normal((3, 9, NY, NX))
        sb = rng.standard_normal((3, 9, NY, NX))
        refb = np.asarray(S.stream_bounceback_gather(jnp.asarray(fb),
                                                     stale=jnp.asarray(sb)))
        gotb = np.asarray(S.stream_bounceback(jnp.asarray(fb),
                                              stale=jnp.asarray(sb)))
        np.testing.assert_array_equal(gotb, refb)


def test_hole_values_from_periodic_recovers_post():
    from lbm_tpu.ops import stream as S

    rng = np.random.default_rng(22)
    f_post = jnp.asarray(rng.standard_normal((3, 9, 12, 20)))
    out_p = stream_periodic(f_post)
    direct = S.hole_values(f_post)
    recovered = S.hole_values_from_periodic(out_p)
    for d, r in zip(direct, recovered):
        np.testing.assert_array_equal(np.asarray(d), np.asarray(r))


def test_bounceback_fix_dirs_gated_matches_ungated():
    """bounceback_fix_dirs_gated with wall masks pinned to the static rows
    0 / NY-1 is bitwise bounceback_fix_dirs (the claim its docstring makes:
    the gated form exists for K-deep-ghost bands/shards whose wall rows are
    traced; on a full grid the masks degenerate to the static edges)."""
    import jax

    from lbm_tpu.constants import D2Q9
    from lbm_tpu.ops import stream as S

    rng = np.random.default_rng(23)
    for (NY, NX) in [(8, 8), (8, 16), (12, 20), (9, 11)]:
        fd = [jnp.asarray(rng.standard_normal((NY, NX))) for _ in range(9)]
        stale_pl = [jnp.asarray(rng.standard_normal((NY, NX)))
                    for _ in range(9)]

        def roll(a, sy, sx):
            return jnp.roll(a, shift=(sy, sx), axis=(0, 1))

        out = [roll(fd[q], int(D2Q9.CY[q]), int(D2Q9.CX[q]))
               for q in range(9)]
        holes = [stale_pl[i][y, x] for (i, y, x) in S.HOLE_SLOTS]
        a = S.bounceback_fix_dirs(list(out), list(fd), holes)

        iy = jax.lax.broadcasted_iota(jnp.int32, (NY, NX), 0)
        is_b = iy == 0
        is_t = iy == NY - 1
        stale = {i: stale_pl[i] for i in (5, 6, 7, 8)}
        b = S.bounceback_fix_dirs_gated(list(out), list(fd), stale,
                                        is_b, is_t)
        for q in range(9):
            np.testing.assert_array_equal(np.asarray(a[q]), np.asarray(b[q]),
                                          err_msg=f"dir {q} at {NY}x{NX}")


def test_bounceback_fix_dirs_gated_all_false_is_periodic_x_walls():
    """With both wall masks all-False (an interior band) only the x-wall
    column fixups apply — every y-wall row and corner hole stays the
    periodic result (the property the banded/sharded trapezoid argument
    needs: interior bands never see wall physics)."""
    from lbm_tpu.constants import D2Q9
    from lbm_tpu.ops import stream as S

    rng = np.random.default_rng(24)
    NY, NX = 12, 16
    fd = [jnp.asarray(rng.standard_normal((NY, NX))) for _ in range(9)]

    def roll(a, sy, sx):
        return jnp.roll(a, shift=(sy, sx), axis=(0, 1))

    out = [roll(fd[q], int(D2Q9.CY[q]), int(D2Q9.CX[q])) for q in range(9)]
    stale = {i: jnp.asarray(rng.standard_normal((NY, NX)))
             for i in (5, 6, 7, 8)}
    false = jnp.zeros((NY, NX), bool)
    got = S.bounceback_fix_dirs_gated(list(out), list(fd), stale,
                                      false, false)
    for q in range(9):
        g = np.asarray(got[q])
        p = np.asarray(out[q])
        if q in (1, 5, 8):    # x-wall fixup owns column 0
            np.testing.assert_array_equal(g[:, 1:], p[:, 1:])
        elif q in (3, 6, 7):  # x-wall fixup owns the last column
            np.testing.assert_array_equal(g[:, :-1], p[:, :-1])
        else:                 # rest/axis-y dirs: untouched without walls
            np.testing.assert_array_equal(g, p)
