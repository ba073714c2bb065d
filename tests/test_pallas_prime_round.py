"""Fused QM31 round/fold kernels (sumcheck/pallas_prime_round.py) vs the
validated jnp kernels.  The Pallas kernels' math is exercised via the
emulate twins (which share qm31_mul_planar and the layout converters with
the kernel bodies); the Mosaic compile and full-protocol equality run in
the TPU drive (tools/tpu_validation.py qm31_perf)."""

import jax.numpy as jnp
import numpy as np
import pytest

from binius_ntt_tpu.fields.m31 import P, qm31_mul
from binius_ntt_tpu.sumcheck import pallas_prime_round as ppr
from binius_ntt_tpu.sumcheck.prime_field import (
    PrimeFieldSumcheck, _fold_kernel, _round_kernel, interpolate_at_host)


def _rand_evals(rows, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, P, size=(2, rows, 4), dtype=np.uint32)


def test_planar_roundtrip():
    evals = jnp.asarray(_rand_evals(512, 0))
    planar = ppr.planar_from_aos(evals)
    assert planar.shape == (2, 4, 4, ppr.LANES)
    assert np.array_equal(np.asarray(ppr.aos_from_planar(planar)),
                          np.asarray(evals))


def test_qm31_mul_planar_matches_schoolbook():
    rng = np.random.default_rng(1)
    a = rng.integers(0, P, size=(2, 256, 4), dtype=np.uint32)
    want = np.asarray(qm31_mul(jnp.asarray(a[0]), jnp.asarray(a[1])))
    pa = tuple(jnp.asarray(a[0, :, k]) for k in range(4))
    pb = tuple(jnp.asarray(a[1, :, k]) for k in range(4))
    got = np.stack([np.asarray(c) for c in ppr.qm31_mul_planar(pa, pb)],
                   axis=-1)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("rows,live", [(4096, 4096), (4096, 1024)])
def test_round_emulate_matches_jnp(rows, live):
    evals = jnp.asarray(_rand_evals(rows, 2 + live))
    want = np.asarray(_round_kernel(evals, jnp.int32(live)))
    got = np.asarray(ppr.round_emulate(
        ppr.planar_from_aos(evals), live))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("rows,live", [(4096, 4096), (4096, 1024)])
def test_fold_emulate_matches_jnp(rows, live):
    evals = jnp.asarray(_rand_evals(rows, 5 + live))
    ch = jnp.asarray(
        np.random.default_rng(9).integers(0, P, size=4, dtype=np.uint32))
    want = np.asarray(_fold_kernel(evals.copy(), ch, jnp.int32(live)))
    got = np.asarray(ppr.aos_from_planar(ppr.fold_emulate(
        ppr.planar_from_aos(evals), ch, live)))
    # only the folded live/2 prefix is contractual (the stale region is
    # never read again); the jnp kernel also leaves the tail untouched
    assert np.array_equal(got[:, :live // 2], want[:, :live // 2])


@pytest.mark.parametrize("live_frac", [1, 2])
def test_round_kernel_interpret_matches_emulate(live_frac):
    """The real kernel body — tiling, scalar-prefetch live-tile dispatch,
    dead-step predication — in Pallas interpret mode, at full and half
    occupancy (half exercises the dead grid steps)."""
    rows = 4 * ppr.TB * ppr.LANES
    live = rows // live_frac
    evals = jnp.asarray(_rand_evals(rows, 31 + live_frac))
    planar = ppr.planar_from_aos(evals)
    got = np.asarray(ppr.round_kernel_impl(
        planar, jnp.int32(live), interpret=True))
    want = np.asarray(ppr.round_emulate(planar, live))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("live_frac", [1, 2])
def test_fold_kernel_interpret_matches_emulate(live_frac):
    rows = 4 * ppr.TB * ppr.LANES
    live = rows // live_frac
    evals = jnp.asarray(_rand_evals(rows, 37 + live_frac))
    ch = jnp.asarray(
        np.random.default_rng(41).integers(0, P, size=4, dtype=np.uint32))
    planar = ppr.planar_from_aos(evals)
    got = np.asarray(ppr.fold_kernel_impl(
        planar, ch, jnp.int32(live), interpret=True))
    want = np.asarray(ppr.fold_emulate(planar, ch, live))
    half = live // ppr.LANES // 2
    assert np.array_equal(got[:, :, :half], want[:, :, :half])


def test_protocol_with_forced_pallas_thresholds():
    """Full protocol with use_pallas=False vs the emulate twins driven
    through the same planar handoff logic, claim-checked every round."""
    from binius_ntt_tpu.fields.m31 import qm31_add_host

    num_vars = 13
    evals = _rand_evals(1 << num_vars, 77)
    s = PrimeFieldSumcheck(evals, use_pallas=False)

    planar = ppr.planar_from_aos(jnp.asarray(evals))
    rows = 1 << num_vars
    rng = np.random.default_rng(123)
    claim = None
    for _ in range(num_vars - 7):       # keep rows >= 2*LANES for emulate
        want = s.round_messages()
        got = np.asarray(ppr.round_emulate(planar, rows))
        assert np.array_equal(got, want)
        p01 = qm31_add_host(want[0], want[1])
        if claim is not None:
            assert np.array_equal(p01, claim)
        ch = rng.integers(0, P, size=4, dtype=np.uint32)
        claim = interpolate_at_host(ch, want)
        s.fold(ch)
        planar = ppr.fold_emulate(planar, jnp.asarray(ch), rows)
        rows //= 2
