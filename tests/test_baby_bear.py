"""BB31 Montgomery arithmetic: the shift-specialised forms vs the generic
limb algebra.

mont_mul's production form exploits the structure of the field constants
(M = 0x88000001 = 2^31 + 2^27 + 1 makes ``M * lo`` shift-only; P =
0x78000001 has limbs 1 and 0x7800 = (1<<15) - (1<<11), collapsing
``hi(red * P)`` to shifts) — these tests pin every specialised helper to
the plain reference recursion so a wrong shift can't survive unnoticed.
Reference semantics: risc0_baby_bear.h:160-179.
"""

import jax.numpy as jnp
import numpy as np

from binius_ntt_tpu.fields import baby_bear as bb

_EDGES = np.array(
    [0, 1, 2, 0xFFFF, 0x10000, 0x7FFFFFFF, 0x80000000, 0xFFFFFFFF,
     bb.P - 1, bb.P, bb.P + 1, 2 * bb.P, bb.M, bb.R2], dtype=np.uint32)


def _samples(n=200_000, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    a[: _EDGES.size] = _EDGES
    return a


def test_mulhi_p_matches_generic():
    a = _samples()
    got = np.asarray(bb._mulhi_P(jnp.asarray(a)))
    want = np.asarray(bb._mulhi32(jnp.asarray(a), jnp.uint32(bb.P)))
    assert np.array_equal(got, want)


def test_mul32_full_matches_uint64():
    a, b = _samples(seed=1), _samples(seed=2)
    lo, hi = bb._mul32_full(jnp.asarray(a), jnp.asarray(b))
    prod = a.astype(np.uint64) * b.astype(np.uint64)
    assert np.array_equal(np.asarray(lo), (prod & 0xFFFFFFFF).astype(np.uint32))
    assert np.array_equal(np.asarray(hi), (prod >> 32).astype(np.uint32))


def test_mont_mul_matches_reference_redc():
    """Production mont_mul == the reference's literal REDC
    (hi + mulhi(M*lo*0xFFFFFFFF, P) + (lo != 0), risc0_baby_bear.h:172-179)
    on random + edge inputs."""
    a, b = _samples(seed=3), _samples(seed=4)
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    lo = ja * jb
    hi = bb._mulhi32(ja, jb)
    red = jnp.uint32(bb.M) * lo * jnp.uint32(0xFFFFFFFF)
    ret = hi + bb._mulhi32(red, jnp.uint32(bb.P)) + (lo != 0).astype(jnp.uint32)
    want = np.asarray(jnp.where(ret >= bb.P, ret - bb.P, ret))
    got = np.asarray(bb.mont_mul(ja, jb))
    assert np.array_equal(got, want)


def test_encode_decode_roundtrip():
    a = _samples() % np.uint32(bb.P)
    dec = np.asarray(bb.decode(bb.encode(jnp.asarray(a))))
    assert np.array_equal(dec, a)
