"""Compact wide tower multiply (fields/tower_compact.py) vs the scalar
oracle.  cf. reference unbitsliced_mul.cuh:16-262 / tower_7_mul.cu:4-24."""

import jax.numpy as jnp
import numpy as np
import pytest

from binius_ntt_tpu.fields import tower_scalar as ts
from binius_ntt_tpu.fields.tower_compact import (
    mul_compact, multiply_alpha_compact)


def _to_int(limbs) -> int:
    return int.from_bytes(np.asarray(limbs).astype("<u4").tobytes(), "little")


@pytest.mark.parametrize("height", [6, 7])
def test_mul_compact_matches_oracle(height):
    rng = np.random.default_rng(height)
    nl = 1 << (height - 5)
    a = rng.integers(0, 2 ** 32, (32, nl), dtype=np.uint32)
    b = rng.integers(0, 2 ** 32, (32, nl), dtype=np.uint32)
    got = np.asarray(mul_compact(jnp.asarray(a), jnp.asarray(b), height))
    ga = np.asarray(multiply_alpha_compact(jnp.asarray(a), height))
    for i in range(32):
        av, bv = _to_int(a[i]), _to_int(b[i])
        assert _to_int(got[i]) == ts.multiply(av, bv, height)
        assert _to_int(ga[i]) == ts.multiply_alpha(av, height)


def test_reference_128bit_kat():
    # the reference's 128-bit vector (tests exercised via tower_scalar KATs):
    # cross-check one fixed product against the scalar oracle end-to-end
    a = 0x0123456789ABCDEF0011223344556677
    b = 0xFEDCBA9876543210AABBCCDDEEFF0099
    la = jnp.asarray(np.frombuffer(
        a.to_bytes(16, "little"), dtype=np.uint32).reshape(1, 4))
    lb = jnp.asarray(np.frombuffer(
        b.to_bytes(16, "little"), dtype=np.uint32).reshape(1, 4))
    got = _to_int(np.asarray(mul_compact(la, lb, 7))[0])
    assert got == ts.multiply(a, b, 7)
