"""BB31 radix-2 NTT tests: golden hashes + fwd/inv round-trip.

cf. reference src/ulvt/ntt/tests/test_ntt.cu:126-187.
"""

import hashlib

import numpy as np
import pytest

from golden_hashes import BB31_NTT_HASHES
from binius_ntt_tpu.fields import baby_bear as bb
from binius_ntt_tpu.ntt.radix2 import NTTRadix2
from binius_ntt_tpu.utils.mt19937 import mt19937_stream


def _digest(arr) -> str:
    return hashlib.md5(np.asarray(arr).astype("<u4").tobytes()).hexdigest()


@pytest.mark.parametrize("log_len", list(range(1, 11)))
def test_bb31_golden(log_len):
    inp = mt19937_stream(0xDEADBEEF + log_len, 1 << log_len)
    out = NTTRadix2(137, 27, log_len).apply(inp)
    assert _digest(out) == BB31_NTT_HASHES[log_len]


def test_roundtrip():
    log_len = 10
    gen = mt19937_stream(0xAABBCCDD, 1 << log_len)
    fwd = NTTRadix2(137, 27, log_len)
    inv = NTTRadix2(bb.inv_host(137), 27, log_len)
    out = np.asarray(inv.apply(np.asarray(fwd.apply(gen))))
    final = (out.astype(np.uint64) * bb.inv_host(1 << log_len)) % bb.P
    assert (final == gen.astype(np.uint64) % bb.P).all()


def test_montgomery_field_ops():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    a = rng.integers(0, bb.P, size=256, dtype=np.uint32)
    b = rng.integers(0, bb.P, size=256, dtype=np.uint32)
    am = bb.encode(jnp.asarray(a))
    bm = bb.encode(jnp.asarray(b))
    prod = np.asarray(bb.decode(bb.mont_mul(am, bm)))
    expect = (a.astype(np.uint64) * b.astype(np.uint64)) % bb.P
    assert (prod == expect).all()
    s = np.asarray(bb.decode(bb.add(am, bm)))
    assert (s == (a.astype(np.uint64) + b) % bb.P).all()
    d = np.asarray(bb.decode(bb.sub(am, bm)))
    assert (d == (a.astype(np.uint64) + bb.P - b) % bb.P).all()


def test_validation():
    with pytest.raises(ValueError):
        NTTRadix2(137, 27, 0)
    with pytest.raises(ValueError):
        NTTRadix2(137, 27, 28)
    with pytest.raises(ValueError):
        NTTRadix2(137, 5, 6)


def test_per_stage_jit_path_matches_golden():
    for log_len in (8, 10):
        inp = mt19937_stream(0xDEADBEEF + log_len, 1 << log_len)
        out = NTTRadix2(137, 27, log_len).apply(inp, per_stage_jit=True)
        assert _digest(out) == BB31_NTT_HASHES[log_len]
