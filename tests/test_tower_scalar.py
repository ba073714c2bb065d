"""Known-answer tests for the scalar tower-field oracle.

Every literal vector is copied from the reference test suite — these
constants are the portable bit-exactness contract:
  * height-5 multiply/square/inverse:
    reference src/ulvt/finite_fields/tests/test_fanpaartower.cu:55-120
  * cross-representation values (also exercised by the SWAR and bit-sliced
    tests): src/ulvt/finite_fields/tests/tests.cu:86-91
  * 128-bit product: src/ulvt/finite_fields/tests/tests.cu:172-201
  * height-7 Karatsuba split vs 64-bit halves:
    src/ulvt/sumcheck/test/utils/tower_7_mul.cu:4-24
"""

from binius_ntt_tpu.fields import tower_scalar as ts

H5_MUL = [
    (0x8B0FB7A7, 0x0CC9B526, 0x1695A347),
    (0x15292D36, 0x96CA6D0C, 0x6BE27E5C),
    (0xA510DF1D, 0xDC41B407, 0xA68B93B1),
    (0x5A727AE6, 0x545E0FE1, 0xD1BEACF8),
    (0xCE7254E6, 0x4DB30A30, 0xA7604999),
    (0xF81191BE, 0x0E366F2E, 0x242A14FB),
    (0x7D12A994, 0xE2DF7626, 0x99CCAFD0),
    (0x0F842FB9, 0xC62861BB, 0xE9C53105),
    (0x85BAC424, 0x0F4ECAF9, 0x57E5C123),
    (0xB2E07978, 0x4B65FF89, 0x589F6811),
    (0x16B4DD34, 0xFFB94D84, 0xC41E546F),
    (0xB6638341, 0x56BE64F1, 0x39513551),
    (0x6CD7829F, 0x993C39D2, 0xC2B49A16),
    (0x43EE57FE, 0x8F74F10B, 0xE9327422),
    (0xC3A8A8F1, 0x8DD4C194, 0xA4BD9048),
    (0xE5F8605E, 0x53CBC3AC, 0x3992EC5E),
    (0x0709BBEF, 0xCB2C72BC, 0x09A14FB2),
    (0xF50AB4FE, 0xB9FEE15D, 0xE2BD264E),
]

H5_SQUARE = [
    (0xF8C6FCEC, 0x01E790CE),
    (0xAD1DCAF0, 0x04190653),
    (0x0EB94B65, 0xE3D07A10),
    (0x4232AC3E, 0xF7CAC33E),
    (0xE0089CC2, 0x4B13D2DF),
    (0x0E7D35B2, 0x14D09875),
    (0x68BD9742, 0xABC65700),
    (0x8A46E227, 0x5EE5C606),
    (0xA605F25C, 0x9249EE0F),
    (0x497D342C, 0x829AC2CD),
    (0x2C1400B9, 0x2FACAC56),
    (0xC67E1B8D, 0x9DFF2BCE),
    (0xDDCC6E06, 0x722B4D2D),
    (0xFF7F8009, 0xF257F206),
    (0xB7E3728E, 0x0CDDDF93),
    (0x64A11278, 0x14269298),
    (0x052FE395, 0x2F80B3E6),
    (0x7EA18BE8, 0x6DE217DB),
    (0x046F5C89, 0xC6900ED8),
    (0x687C1097, 0x54C64214),
]

H5_INVERSE = [
    (0x1D809F9E, 0xE731BCF4),
    (0x5CD22DEA, 0x1764F442),
    (0x359D1EDA, 0x224F1013),
    (0x9FB7F3C9, 0x31043DFE),
    (0x7A2052C1, 0x4D53CE19),
    (0x7B0CA83D, 0xC64879DD),
    (0xD8595C69, 0x218E7B3D),
    (0xC5754984, 0x9C4180D0),
    (0x6D58E041, 0x011D8BF6),
    (0x39A5883C, 0xAB677DBE),
    (0x67EA2529, 0x087E784B),
    (0xCF61F54C, 0x5DA74A0E),
    (0xB4BF2178, 0x22B84E2B),
    (0xE155D245, 0xA366D524),
    (0x9710C57F, 0x0F29CFA4),
    (0xCE34203C, 0x927C60E3),
    (0x87E15651, 0x6D4625D1),
    (0x2FBD30ED, 0xF8C6A8D9),
    (0xC0A4FE94, 0x0D1115E9),
    (0xE77E2C03, 0x769F80AE),
]

# tests.cu:86-91 — same values appear in the SWAR and bit-sliced suites.
H5_CROSS = [
    (0xD82C07CD, 0xD82C07CD, 0xAFAB1B8F),
    (0x6B4C9946, 0xD82C07CD, 0xF35C8D0F),
    (0x6B4C9946, 0x3D47E731, 0xF849322D),
    (0xBE127079, 0xD82C07CD, 0xD86F9EBA),
    (0xBE127079, 0x2CD911FC, 0x2B8B8F27),
]


def test_h5_multiply():
    for a, b, expect in H5_MUL + H5_CROSS:
        assert ts.multiply(a, b, 5) == expect
        assert ts.multiply(b, a, 5) == expect  # commutativity


def test_h5_square():
    for a, expect in H5_SQUARE:
        assert ts.square(a, 5) == expect
        assert ts.multiply(a, a, 5) == expect


def test_h5_inverse():
    for a, expect in H5_INVERSE:
        assert ts.inverse(a, 5) == expect
        assert ts.multiply(a, expect, 5) == 1


def test_h7_multiply():
    # tests.cu:172-201 (little-endian hex strings)
    a = 0xF31223322755A4797859382795323434
    b = 0xD3473493847943875934759322048438
    expect = 0xCEAA247E2DC6D28C999C424F4B3220E5
    assert ts.multiply(a, b, 7) == expect


def test_h7_matches_karatsuba_split():
    # tower_7_mul.cu:4-24 — one Karatsuba level over 64-bit halves
    a = 0xF31223322755A4797859382795323434
    b = 0xD3473493847943875934759322048438
    m = (1 << 64) - 1
    a0, a1 = a & m, a >> 64
    b0, b1 = b & m, b >> 64
    a0b0 = ts.multiply(a0, b0, 6)
    a0b1 = ts.multiply(a0, b1, 6)
    a1b0 = ts.multiply(a1, b0, 6)
    a1b1 = ts.multiply(a1, b1, 6)
    bottom = a0b0 ^ a1b1
    top = a0b1 ^ a1b0 ^ ts.multiply_alpha(a1b1, 6)
    assert (top << 64) | bottom == ts.multiply(a, b, 7)


def test_field_axioms_small_heights():
    import random

    rng = random.Random(1234)
    for height in range(0, 8):
        nbits = 1 << height
        for _ in range(16):
            a = rng.getrandbits(nbits)
            b = rng.getrandbits(nbits)
            c = rng.getrandbits(nbits)
            ab = ts.multiply(a, b, height)
            assert ts.multiply(b, a, height) == ab
            # distributivity over XOR addition
            assert ts.multiply(a, b ^ c, height) == ab ^ ts.multiply(a, c, height)
            # identity
            assert ts.multiply(a, 1, height) == a
            # inverse
            if a:
                assert ts.multiply(a, ts.inverse(a, height), height) == 1
            # square == self-multiply, alpha == multiply by generator
            assert ts.square(a, height) == ts.multiply(a, a, height)
            alpha = 1 << (nbits // 2) if height > 0 else 1
            assert ts.multiply_alpha(a, height) == ts.multiply(a, alpha, height)


def test_subfield_embedding():
    # height-2 tables from binary_tower.cuh:160-174 spot checks
    assert ts.inverse(0x5, 2) == 0xE
    assert ts.inverse(0x7, 2) == 0xF
    assert ts.multiply_alpha(0x1, 2) == 0x4
    assert ts.square(0x4, 2) == 0x9
