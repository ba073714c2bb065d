"""Sumcheck verifier — the test oracle for the prover.

Port of the reference verifier used as a test oracle
(src/ulvt/sumcheck/test/verifier.cu:9-107 and
test/kernel/verifier_kernel.cu:5-37), over Python ints via the scalar tower
oracle.  The interpolation points 0..k live in the height-2 subfield, so the
Lagrange denominators are inverted there
(inverse_at_interpolation_point, test/utils/tower_7_mul.cu:22-24).
"""

from __future__ import annotations

from ..fields import tower_scalar as ts

HEIGHT = 7

__all__ = [
    "evaluate_univariate_given_points",
    "evaluate_multilinear_given_point",
    "evaluate_multilinear_composition",
    "words_to_int",
    "int_to_words",
]


def words_to_int(words) -> int:
    """4 little-endian uint32 words -> 128-bit int (test/utils/bigints.cu:6-19)."""
    out = 0
    for i, w in enumerate(words):
        out |= int(w) << (32 * i)
    return out


def int_to_words(value: int, count: int = 4):
    return [(value >> (32 * i)) & 0xFFFFFFFF for i in range(count)]


def evaluate_univariate_given_points(challenge: int, points, num_points: int) -> int:
    """Lagrange interpolation at `challenge` over x = 0..num_points-1.

    cf. verifier.cu:9-31.
    """
    evaluation = 0
    for cur in range(num_points):
        prod = points[cur]
        for other in range(num_points):
            if other == cur:
                continue
            prod = ts.multiply(prod, challenge ^ other, HEIGHT)
            prod = ts.multiply(prod, ts.inverse(cur ^ other, 2), HEIGHT)
        evaluation ^= prod
    return evaluation


def evaluate_multilinear_given_point(basis_evals, challenges) -> int:
    """Brute-force multilinear evaluation; cf. verifier_kernel.cu:5-37.

    basis_evals: list of 2^n 128-bit ints; challenges: list of n ints,
    challenge[0] binds the *most significant* index bit (the kernel walks
    bits LSB-first against challenges in reverse order).
    """
    n = len(challenges)
    evaluation = 0
    for idx, val in enumerate(basis_evals):
        prod = val
        shifted = idx
        for var in range(n):
            c = challenges[n - 1 - var]
            prod = ts.multiply(prod, c if (shifted & 1) else c ^ 1, HEIGHT)
            shifted >>= 1
        evaluation ^= prod
    return evaluation


def evaluate_multilinear_composition(columns, challenges) -> int:
    """Product over columns of their multilinear evaluations; verifier.cu:88-107."""
    product = 1
    for col in columns:
        product = ts.multiply(
            product, evaluate_multilinear_given_point(col, challenges), HEIGHT
        )
    return product
