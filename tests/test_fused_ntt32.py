"""Stage-group-fused GF(2^32) NTT kernel (ntt/pallas_fused32.py).

The tile math (_group_body32) is exercised through the jnp emulation (the
same function the Pallas kernel calls); Mosaic compilation and on-device
bit-exactness are covered by the TPU drive (golden MD5 hashes, full
reference range — cf. src/ulvt/ntt/tests/test_ntt.cu:219-234).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from binius_ntt_tpu.layout.bitslicing import (bitslice_transpose,
                                              bitslice_untranspose)
from binius_ntt_tpu.ntt import pallas_fused32 as pf32
from binius_ntt_tpu.ntt.additive import AdditiveNTT, precompute_subspace_evals
from binius_ntt_tpu.utils.mt19937 import mt19937_stream


def _run_fused(log_h, log_rate, x):
    n = 1 << log_h
    cosets = 1 << log_rate
    rows = precompute_subspace_evals(log_h, log_rate, 5)
    tables = pf32.build_tables32(rows, log_h, log_rate)
    sliced = bitslice_transpose(np.asarray(x).reshape(n // 32, 32))
    packed = jnp.asarray(sliced.reshape(n // 128, 128))
    out = pf32.apply_fused32(packed, tables, log_h=log_h, log_rate=log_rate,
                             emulate=True)
    return bitslice_untranspose(
        np.asarray(out).reshape(cosets * n // 32, 32)).reshape(-1)


@pytest.mark.parametrize(
    "log_h,log_rate,kb,ku,pt",
    [
        (7, 0, 11, 9, 8),    # single packed row: c/j stages only, kb=0
        (7, 2, 11, 9, 8),    # rated cosets through the instance index
        (10, 0, 11, 9, 8),   # single bottom group, zero-twiddle top skip
        (11, 4, 11, 9, 8),   # max rate
        (13, 2, 2, 2, 2),    # bottom + two upper groups (multi-group seams)
    ],
)
def test_fused32_matches_per_stage(log_h, log_rate, kb, ku, pt,
                                   monkeypatch):
    monkeypatch.setattr(pf32, "KB", kb)
    monkeypatch.setattr(pf32, "KU", ku)
    monkeypatch.setattr(pf32, "PT", pt)
    x = mt19937_stream(0xDEADBEEF + log_h + log_rate, 1 << log_h)
    want = np.asarray(
        AdditiveNTT(log_h, log_rate, use_fused=False).apply(x))
    got = _run_fused(log_h, log_rate, x)
    assert np.array_equal(got, want)


def test_group_plan_covers_all_bits():
    for log_nbr in range(0, 24):
        groups = pf32.plan_groups32(log_nbr)
        bits = []
        for (t0, k, low) in groups:
            bits.extend(range(t0, t0 + k))
        assert bits == list(range(log_nbr))
        assert groups[0][2] is True and all(not g[2] for g in groups[1:])
