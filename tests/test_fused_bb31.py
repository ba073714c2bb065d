"""Stage-group-fused radix-2 BB31 kernel (ntt/pallas_fused_bb31.py).

The tile math (_r2_body) is exercised through the jnp emulation (the same
function the Pallas kernel calls); Mosaic compilation and on-device
bit-exactness are covered by the TPU drive (golden MD5 hashes, full
reference range — cf. src/ulvt/ntt/tests/test_ntt.cu:126-152).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from binius_ntt_tpu.ntt import pallas_fused_bb31 as pfb
from binius_ntt_tpu.ntt.radix2 import NTTRadix2
from binius_ntt_tpu.utils.mt19937 import mt19937_stream


def _run_fused(ntt, x):
    static, arrays = pfb.split_tables_r2(
        pfb.build_tables_r2(np.asarray(ntt._tw_mont), ntt.log_n))
    xb = jnp.asarray(x, jnp.uint32)[np.asarray(ntt._bitrev)]
    return np.asarray(pfb.apply_fused_r2(
        xb, arrays, static=static, log_n=ntt.log_n, emulate=True))


@pytest.mark.parametrize(
    "log_n,kb,ku,pt",
    [
        (7, 12, 10, 8),      # single row: lane stages only (kb=0)
        (10, 12, 10, 8),     # single bottom group + top-stage mul skip
        (13, 2, 2, 2),       # bottom + two upper groups (multi-group seams)
    ],
)
def test_fused_bb31_matches_per_stage(log_n, kb, ku, pt, monkeypatch):
    monkeypatch.setattr(pfb, "KB", kb)
    monkeypatch.setattr(pfb, "KU", ku)
    monkeypatch.setattr(pfb, "PT", pt)
    ntt = NTTRadix2(137, 27, log_n, use_fused=False)
    x = mt19937_stream(0xDEADBEEF + log_n, 1 << log_n)
    want = np.asarray(ntt.apply(x))
    assert np.array_equal(_run_fused(ntt, x), want)


def test_fused_bb31_roundtrip_inverse():
    """fwd(g) then fwd(g^-1) scaled by 1/n == identity (test_ntt.cu:154-187)
    through the fused table builder."""
    from binius_ntt_tpu.fields import baby_bear as bb

    log_n = 9
    n = 1 << log_n
    g = 137
    ntt = NTTRadix2(g, 27, log_n, use_fused=False)
    inv_ntt = NTTRadix2(bb.inv_host(g), 27, log_n, use_fused=False)
    x = mt19937_stream(3, n) % np.uint32(bb.P)
    y = _run_fused(ntt, x)
    z = _run_fused(inv_ntt, y)
    n_inv = bb.inv_host(n)
    z = (z.astype(np.uint64) * np.uint64(n_inv) % np.uint64(bb.P)).astype(
        np.uint32)
    assert np.array_equal(z, x)
