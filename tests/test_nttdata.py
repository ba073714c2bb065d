"""Order-carrying NTTData wrapper (cf. the reference's NTTData/DataOrder,
src/ulvt/ntt/nttconf.cuh:9-21; the additive order assertion,
additive_ntt.cuh:206-208; radix-2 output labeled IN_ORDER, gpuntt.cuh:180).
"""

import numpy as np
import pytest

from binius_ntt_tpu.ntt.additive import AdditiveNTT
from binius_ntt_tpu.ntt.additive_bitsliced import AdditiveNTT128
from binius_ntt_tpu.ntt.nttdata import DataOrder, NTTData
from binius_ntt_tpu.ntt.radix2 import NTTRadix2, bit_reverse_indices
from binius_ntt_tpu.utils.mt19937 import mt19937_stream


def test_radix2_nttdata_orders():
    log_n = 8
    x = mt19937_stream(1, 1 << log_n)
    ntt = NTTRadix2(137, 27, log_n)
    plain = np.asarray(ntt.apply(x))
    out = ntt.apply(NTTData(x))
    assert isinstance(out, NTTData) and out.order is DataOrder.IN_ORDER
    assert np.array_equal(np.asarray(out.data), plain)
    # a BIT_REVERSED wrapper skips the kernel's own reversal — feeding the
    # pre-reversed array reproduces the same transform
    xb = x[bit_reverse_indices(log_n)]
    out2 = ntt.apply(NTTData(xb, DataOrder.BIT_REVERSED))
    assert np.array_equal(np.asarray(out2.data), plain)


def test_additive_nttdata_order_assertion():
    ntt = AdditiveNTT(8, 0)
    x = mt19937_stream(2, 1 << 8)
    plain = np.asarray(ntt.apply(x))
    out = ntt.apply(NTTData(x))
    assert out.order is DataOrder.IN_ORDER
    assert np.array_equal(np.asarray(out.data), plain)
    with pytest.raises(ValueError):
        ntt.apply(NTTData(x, DataOrder.BIT_REVERSED))


def test_additive128_nttdata():
    ntt = AdditiveNTT128(6, 0)
    w = mt19937_stream(3, (1 << 6) * 4)
    plain = np.asarray(ntt.apply(w))
    out = ntt.apply(NTTData(w))
    assert out.order is DataOrder.IN_ORDER
    assert np.array_equal(np.asarray(out.data), plain)
    with pytest.raises(ValueError):
        ntt.apply(NTTData(w, DataOrder.BIT_REVERSED))
