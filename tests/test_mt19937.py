"""std::mt19937 bit-exactness tests (golden-input generator).

The 10000th output of std::mt19937(5489) is 4123659995 (C++ standard,
[rand.predef]); the other vectors were produced with g++ std::mt19937.
"""

import numpy as np

from binius_ntt_tpu.utils.mt19937 import MT19937, mt19937_stream


def test_standard_10000th():
    assert int(mt19937_stream(5489, 10000)[9999]) == 4123659995


def test_reference_seed_vectors():
    # std::mt19937(0xdeadbeef + 5) — the additive-NTT log_h=5, r=0 input seed
    got = mt19937_stream(0xDEADBEEF + 5, 8)
    expect = np.array(
        [4215495120, 2045699916, 3728998417, 3087246419,
         1767355928, 4183842478, 2377830564, 3746434813],
        dtype=np.uint32,
    )
    assert (got == expect).all()


def test_xor_of_2000():
    k = mt19937_stream(0xAABBCCDD, 2000)
    x = 0
    for v in k:
        x ^= int(v)
    assert x == 1975801597


def test_incremental_draw_matches_bulk():
    g = MT19937(42)
    parts = np.concatenate([g.draw(7), g.draw(900), g.draw(1)])
    assert (parts == mt19937_stream(42, 908)).all()
