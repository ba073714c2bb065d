"""Native C++ oracle: cross-language validation (tools/native/oracle.cpp).

An implementation-independent reference (separate codebase and language)
used for golden-vector generation at sizes the Python oracle cannot reach.
"""

import hashlib

import numpy as np
import pytest

from golden_hashes import ADDITIVE_NTT_HASHES
from binius_ntt_tpu.utils import native_oracle as no
from binius_ntt_tpu.utils.mt19937 import mt19937_stream
from binius_ntt_tpu.fields import tower_scalar as ts

pytestmark = pytest.mark.skipif(not no.available(),
                                reason="g++/native build unavailable")


def test_native_mt19937():
    assert (no.mt19937_fill(0xDEADBEEF + 5, 1000)
            == mt19937_stream(0xDEADBEEF + 5, 1000)).all()


def test_native_mul128_vs_python_oracle():
    a = mt19937_stream(1, 40)
    b = mt19937_stream(2, 40)
    got = no.tower_mul128(a, b)
    for i in range(10):
        av = int.from_bytes(a[4*i:4*i+4].astype("<u4").tobytes(), "little")
        bv = int.from_bytes(b[4*i:4*i+4].astype("<u4").tobytes(), "little")
        gv = int.from_bytes(got[4*i:4*i+4].astype("<u4").tobytes(), "little")
        assert gv == ts.multiply(av, bv, 7)


@pytest.mark.parametrize("log_h,log_rate", [(12, 0), (12, 2), (16, 0)])
def test_native_ntt32_golden(log_h, log_rate):
    inp = no.mt19937_fill(0xDEADBEEF + log_h + log_rate, 1 << log_h)
    out = no.additive_ntt32(inp, log_h, log_rate)
    d = hashlib.md5(out.astype("<u4").tobytes()).hexdigest()
    assert d == ADDITIVE_NTT_HASHES[log_rate][log_h]


def test_native_ntt128_vs_python_oracle():
    from binius_ntt_tpu.ntt.reference import additive_ntt_scalar
    log_h = 6
    words = mt19937_stream(42 + log_h, (1 << log_h) * 4)
    vals = [int.from_bytes(words[i*4:(i+1)*4].astype("<u4").tobytes(), "little")
            for i in range(1 << log_h)]
    expect = additive_ntt_scalar(vals, log_h, 0, 7)
    got = no.additive_ntt128(words, log_h, 0)
    gotv = [int.from_bytes(got[i*4:(i+1)*4].astype("<u4").tobytes(), "little")
            for i in range(1 << log_h)]
    assert gotv == expect
