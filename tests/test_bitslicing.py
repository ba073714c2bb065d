"""Bit-slicing layout tests.

Round-trip and literal-layout tests matching the reference semantics in
src/ulvt/utils/bitslicing.cuh and its usage in
src/ulvt/finite_fields/tests/test_fanpaartower.cu:122-274.
"""

import numpy as np

from binius_ntt_tpu.layout.bitslicing import (
    bitslice_transpose,
    bitslice_untranspose,
    repeat_value_bitsliced,
    transpose32,
)
from binius_ntt_tpu.utils.mt19937 import mt19937_stream


def test_transpose32_involution_and_semantics():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 1 << 32, size=(5, 32), dtype=np.uint32)
    t = transpose32(a)
    # semantics: bit j of t[i] == bit i of a[j]
    for i in range(32):
        for j in range(0, 32, 7):
            assert ((int(t[0, i]) >> j) & 1) == ((int(a[0, j]) >> i) & 1)
    assert (transpose32(t) == a).all()


def test_bitslice_roundtrip_w32_w128():
    rng = np.random.default_rng(11)
    for width in (32, 128):
        a = rng.integers(0, 1 << 32, size=(4, width), dtype=np.uint32)
        s = bitslice_transpose(a)
        assert (bitslice_untranspose(s) == a).all()
        assert (bitslice_transpose(bitslice_untranspose(a)) == a).all()


def test_bitsliced_word_is_bit_plane():
    # Contract: sliced word i holds bit i of element j in lane-bit j.
    width = 128
    ipv = width // 32
    vals = mt19937_stream(99, width)
    batch = vals.reshape(width)
    s = bitslice_transpose(batch)
    elems = [
        int.from_bytes(batch[j * ipv : (j + 1) * ipv].astype("<u4").tobytes(), "little")
        for j in range(32)
    ]
    for i in range(0, width, 13):
        plane = int(s[i])
        for j in range(0, 32, 5):
            assert ((plane >> j) & 1) == ((elems[j] >> i) & 1)


def test_repeat_value_bitsliced():
    width = 128
    value = np.array([0x12345678, 0x9ABCDEF0, 0x0F0F0F0F, 0xDEADBEEF], np.uint32)
    s = repeat_value_bitsliced(value, width)
    back = bitslice_untranspose(s)
    assert (back.reshape(32, 4) == value).all()
    # a value < 16 occupies only the first four bit-planes (used by the
    # sumcheck interpolation coefficients, sumcheck.cuh:103-121)
    s2 = repeat_value_bitsliced(np.array([3, 0, 0, 0], np.uint32), width)
    assert (s2[:2] == 0xFFFFFFFF).all() and (s2[2:] == 0).all()


def test_jax_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 32, size=(3, 128), dtype=np.uint32)
    s_np = bitslice_transpose(a)
    s_jx = np.asarray(bitslice_transpose(jnp.asarray(a)))
    assert (s_np == s_jx).all()
    u_jx = np.asarray(bitslice_untranspose(jnp.asarray(s_np)))
    assert (u_jx == a).all()


def test_streamed_matches_plain():
    """Chunk-streamed device transposes == whole-array transforms.

    The streamed forms exist for capacity sizes (2^26-2^29 outputs) where
    whole-array device transposes blow HLO temps past HBM and the numpy
    fallback costs ~50 min of single-core host time (the 2^28 golden run);
    chunking is valid because every 32-element batch row transposes
    independently (bitslicing.cuh:32-64 operates per batch)."""
    import jax.numpy as jnp

    from binius_ntt_tpu.layout.bitslicing import (
        bitslice_transpose_streamed, bitslice_untranspose_streamed)

    rng = np.random.default_rng(11)
    a = rng.integers(0, 2**32, size=(1 << 9, 128), dtype=np.uint32)
    want = bitslice_transpose(a)
    # chunked (chunk_rows < rows) and single-shot paths
    for chunk in (32, 1 << 20):
        got = np.asarray(bitslice_transpose_streamed(a, chunk_rows=chunk))
        assert (got == want).all()
        back = bitslice_untranspose_streamed(jnp.asarray(want),
                                             chunk_rows=chunk)
        assert (back == a).all()
