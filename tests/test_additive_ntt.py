"""Additive NTT golden-hash tests (single device).

Inputs: std::mt19937(0xdeadbeef + log_h + log_rate) raw stream; digest: MD5
over output uint32 words little-endian — exactly run_and_check_additive_ntt
(reference src/ulvt/ntt/tests/test_ntt.cu:191-217).
"""

import hashlib

import numpy as np
import pytest

from golden_hashes import ADDITIVE_NTT_HASHES
from binius_ntt_tpu.ntt.additive import AdditiveNTT
from binius_ntt_tpu.utils.mt19937 import mt19937_stream


def _digest(arr) -> str:
    return hashlib.md5(np.asarray(arr).astype("<u4").tobytes()).hexdigest()


@pytest.mark.parametrize("log_rate", [0, 2])
@pytest.mark.parametrize("log_h", list(range(1, 11)))
def test_additive_ntt_golden(log_h, log_rate):
    inp = mt19937_stream(0xDEADBEEF + log_h + log_rate, 1 << log_h)
    out = AdditiveNTT(log_h, log_rate).apply(inp)
    assert _digest(out) == ADDITIVE_NTT_HASHES[log_rate][log_h]


def test_additive_ntt_r1_and_r4_structure():
    # rates without reference hashes: coset 0 of a rate-r transform must
    # equal the rate-0 transform (the NTT evaluates the same polynomial on
    # 2^log_rate cosets; coset row 0 is the base subspace)
    log_h = 6
    inp = mt19937_stream(0xDEADBEEF + 123, 1 << log_h)
    base = np.asarray(AdditiveNTT(log_h, 0).apply(inp))
    for log_rate in (1, 3, 4):
        ext = np.asarray(AdditiveNTT(log_h, log_rate).apply(inp))
        assert ext.shape == ((1 << (log_h + log_rate)),)
        assert (ext[: 1 << log_h] == base).all()


def test_validation():
    with pytest.raises(ValueError):
        AdditiveNTT(0, 0)
    with pytest.raises(ValueError):
        AdditiveNTT(4, 5)
    with pytest.raises(ValueError):
        AdditiveNTT(31, 2)  # log_h + log_rate > 32


def test_per_stage_jit_path_matches_golden():
    # the large-size path (transposed small-span stages, one jit per stage)
    import hashlib

    import numpy as np

    from golden_hashes import ADDITIVE_NTT_HASHES
    from binius_ntt_tpu.utils.mt19937 import mt19937_stream

    for log_h, rate in [(9, 0), (10, 2)]:
        x = mt19937_stream(0xDEADBEEF + log_h + rate, 1 << log_h)
        out = AdditiveNTT(log_h, rate).apply(x, per_stage_jit=True)
        got = hashlib.md5(np.asarray(out).astype("<u4").tobytes()).hexdigest()
        assert got == ADDITIVE_NTT_HASHES[rate][log_h]
