"""Stage-group-fused NTT kernel (ntt/pallas_fused.py) vs the validated path.

The fused kernel's tile math (_group_body) is exercised through the jnp
emulation (same function the Pallas kernel calls); Mosaic compilation and
bit-exactness on hardware are covered by the TPU drive (golden hashes).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from binius_ntt_tpu.layout.bitslicing import bitslice_transpose
from binius_ntt_tpu.ntt import pallas_fused as pf
from binius_ntt_tpu.ntt.additive import precompute_subspace_evals
from binius_ntt_tpu.ntt.additive_bitsliced import AdditiveNTT128
from binius_ntt_tpu.utils.mt19937 import mt19937_stream


def _run_fused(log_h, log_rate, sliced):
    rows = precompute_subspace_evals(log_h, log_rate, 7)
    tables = pf.build_tables(rows, log_h, log_rate)
    return np.asarray(pf.apply_fused(
        jnp.asarray(sliced), tables, log_h=log_h, log_rate=log_rate,
        emulate=True))


@pytest.mark.parametrize(
    "log_h,log_rate,kb,ku,pt",
    [
        (8, 0, 10, 9, 8),   # single bottom group; zero-twiddle top-stage skip
        (9, 1, 2, 2, 2),    # bottom + two upper groups (multi-group seams)
                            # and cosets
    ],
)
def test_fused_matches_per_stage(log_h, log_rate, kb, ku, pt, monkeypatch):
    monkeypatch.setattr(pf, "KB", kb)
    monkeypatch.setattr(pf, "KU", ku)
    monkeypatch.setattr(pf, "PT", pt)
    ntt = AdditiveNTT128(log_h, log_rate, use_pallas=False, use_fused=False)
    words = mt19937_stream(0xDEADBEEF + log_h, (1 << log_h) * 4)
    sliced = np.asarray(
        bitslice_transpose(jnp.asarray(words.reshape(-1, 128))))
    want = np.asarray(ntt.apply_sliced(jnp.asarray(sliced)))
    got = _run_fused(log_h, log_rate, sliced)
    assert np.array_equal(got, want)


def test_group_plan_covers_all_bits():
    for log_nb in range(0, 26):
        groups = pf.plan_groups(log_nb)
        bits = []
        for (t0, k, low) in groups:
            bits.extend(range(t0, t0 + k))
        assert bits == list(range(log_nb))
        assert groups[0][2] is True and all(not g[2] for g in groups[1:])
