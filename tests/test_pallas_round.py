"""Fused sumcheck round kernel (sumcheck/pallas_round.py) vs the validated
tiled kernel.  The Pallas kernel's math is exercised via round_emulate; the
Mosaic compile and full-protocol equality run in the TPU drive."""

import jax.numpy as jnp
import numpy as np
import pytest

from binius_ntt_tpu.sumcheck import pallas_round as pr
from binius_ntt_tpu.sumcheck.prover import (
    INTS_PER_VALUE, Sumcheck, _round_kernel_tiled)
from binius_ntt_tpu.utils.mt19937 import mt19937_stream


@pytest.mark.parametrize("num_vars,comp", [(10, 2), (11, 3), (10, 4)])
def test_round_matches_tiled(num_vars, comp):
    evals = mt19937_stream(5 + comp, INTS_PER_VALUE * (1 << num_vars) * comp)
    s = Sumcheck(evals, comp, num_vars)
    rows = (1 << num_vars) // 32
    want = np.asarray(_round_kernel_tiled(
        s._device_evals, s._coeffs, jnp.int32(rows), num_points=comp + 1))
    got = np.asarray(pr.round_emulate(
        s._device_evals, num_points=comp + 1))
    assert np.array_equal(got, want)


def test_fold_matrices():
    # M_0 = 0 (fold to lower), M_1 = I (fold to upper)
    assert pr._fold_matrix(0) == ((), (), (), ())
    assert pr._fold_matrix(1) == ((0,), (1,), (2,), (3,))
    # M_2: multiplication by 2 in GF(16) tower is a permutation-ish map
    m2 = pr._fold_matrix(2)
    assert all(len(r) >= 1 for r in m2)
