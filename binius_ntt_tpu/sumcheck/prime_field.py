"""Sumcheck prover over the QM31 prime extension field — TPU-native.

Parity with the reference prime-field prover
(src/ulvt/prime_field_sumcheck/sumcheck.cuh:8-97, core/kernels.cu:5-78):
  * fixed 2 multilinear columns, degree-2 composition (a product);
  * ``round_messages()`` returns the round polynomial evaluated at X = 0, 1, 2:
    p(0) = sum of lower products, p(1) = sum of upper products,
    p(2) via (upper - lower) + upper per column (kernels.cu:44-63);
  * ``fold(challenge)``: lower' = lower + (upper - lower) * challenge
    (kernels.cu:5-25).

TPU formulation: sums are modular tree reductions with the M31 add monoid —
bit-identical to the reference's lazy u64 accumulation + atomicAdd + final
reduction (kernels.cu:65-77, qm31.cuh:75-78) because every partial is
canonical mod P and addition mod P is associative/commutative.  This also
maps directly onto ``psum``-style cross-device reduction later.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.m31 import P, m31_add, m31_sub, qm31_mul

__all__ = ["PrimeFieldSumcheck", "interpolate_at_host"]

ONE_HALF = 0x40000000  # 2^30 == 1/2 mod P (prime_field_sumcheck/utils/interpolate.hpp:3)


# Fixed-shape kernels: the buffer keeps its full (2, B, 4) shape for the
# whole protocol and the live row count arrives as a traced scalar, so ONE
# compile serves every round (the reference re-picks launch dims per round
# through a 13-way if/else ladder, test_sumcheck.cu:36-64; per-round-shape
# jits paid one remote XLA compile per round through the tunnel).
ROW_TILE = 4096


@jax.jit
def _round_kernel(evals, rows):
    """evals: (2, B, 4), rows: traced live count -> points (3, 4)."""
    _, b, _ = evals.shape
    tile = min(ROW_TILE, b // 2)
    half = rows // 2
    tiles = (half + tile - 1) // tile

    def masked(t, base):
        idx = base + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
        return jnp.where(idx < half, t, jnp.uint32(0))

    def body(state):
        i, acc = state
        base = i * tile
        lower = jax.lax.dynamic_slice(evals, (0, base, 0), (2, tile, 4))
        upper = jax.lax.dynamic_slice(
            evals, (0, base + half, 0), (2, tile, 4))
        two_up_minus_low = m31_add(m31_sub(upper, lower), upper)

        def reduce_prod(lo, up):  # (tile, 4) each -> (4,)
            prod = masked(qm31_mul(lo, up), base)   # 0 = add identity
            return jax.lax.reduce(prod, jnp.uint32(0), _m31_add_monoid, (0,))

        part = jnp.stack([
            reduce_prod(lower[0], lower[1]),
            reduce_prod(upper[0], upper[1]),
            reduce_prod(two_up_minus_low[0], two_up_minus_low[1]),
        ])
        return i + jnp.int32(1), _m31_add_monoid(acc, part)

    init = (jnp.int32(0), jnp.zeros((3, 4), jnp.uint32))
    _, acc = jax.lax.while_loop(lambda s: s[0] < tiles, body, init)
    # the monoid keeps the s == P alias of 0 (self-correcting on every
    # later add, but not on the last one): canonicalise the final value
    return jnp.where(acc == jnp.uint32(P), jnp.uint32(0), acc)


def _m31_add_monoid(a, b):
    s = a + b
    return (s + (s >> 31)) & jnp.uint32(P)


@functools.partial(jax.jit, donate_argnums=(0,))
def _fold_kernel(evals, challenge, rows):
    """Fold rows [0, rows) in half in the fixed (2, B, 4) buffer; the stale
    upper region is never read again (kernels.cu:20-28 convention).
    Donates the buffer (the caller rebinds) so peak HBM stays one copy."""
    _, b, _ = evals.shape
    tile = min(ROW_TILE, b // 2)
    half = rows // 2
    tiles = (half + tile - 1) // tile

    def body(state):
        i, buf = state
        base = i * tile
        lower = jax.lax.dynamic_slice(evals, (0, base, 0), (2, tile, 4))
        upper = jax.lax.dynamic_slice(
            evals, (0, base + half, 0), (2, tile, 4))
        folded = m31_add(lower, qm31_mul(m31_sub(upper, lower), challenge))
        idx = base + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
        folded = jnp.where(idx < half, folded, lower)
        buf = jax.lax.dynamic_update_slice(buf, folded, (0, base, 0))
        return i + jnp.int32(1), buf

    init = (jnp.int32(0), evals)
    _, buf = jax.lax.while_loop(lambda s: s[0] < tiles, body, init)
    return buf


class PrimeFieldSumcheck:
    """QM31 sumcheck prover for the degree-2 two-column composition.

    Two execution paths, selected per round size:

      * ``use_pallas`` (default on TPU backends): fused planar Pallas
        round/fold kernels (pallas_prime_round.py) while the live row
        count fills at least one tile; the buffer then converts back to
        the AoS layout once and the tail runs on the jnp kernels below
        — the same large-path / small-tail split as the reference's
        GPU kernels + shrinking launch ladder
        (prime_field_sumcheck/test_sumcheck.cu:36-64).
      * jnp fixed-shape while_loop kernels everywhere else.
    """

    def __init__(self, evals, use_pallas: bool | None = None):
        """evals: (2, 2^n, 4) uint32 QM31 columns, components canonical."""
        from . import pallas_prime_round as ppr

        evals = jnp.asarray(evals, dtype=jnp.uint32)
        assert evals.ndim == 3 and evals.shape[0] == 2 and evals.shape[2] == 4
        self._num_rows = evals.shape[1]
        self.round = 0
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self._planar = None
        if use_pallas and self._num_rows >= 2 * ppr.TB * ppr.LANES:
            self._planar = ppr.planar_from_aos(evals)
            self._evals = None
        else:
            self._evals = evals

    # ---- checkpoint / resume -------------------------------------------
    # (round, live folded rows) is the complete protocol state; rows are
    # serialised in the canonical AoS layout regardless of which execution
    # path (planar Pallas / jnp) currently holds them.

    def state_dict(self) -> dict:
        if self._planar is not None:
            from . import pallas_prime_round as ppr

            live = self._planar[:, :, : self._num_rows // ppr.LANES]
            evals = np.asarray(ppr.aos_from_planar(live))
        else:
            evals = np.asarray(self._evals[:, : self._num_rows])
        return {"round": self.round, "evals": evals}

    @classmethod
    def from_state_dict(cls, d: dict,
                        use_pallas: bool | None = None) -> "PrimeFieldSumcheck":
        self = cls(jnp.asarray(d["evals"]), use_pallas=use_pallas)
        self.round = int(d["round"])
        return self

    def round_messages(self) -> np.ndarray:
        """Round polynomial at X = 0, 1, 2 as a (3, 4) uint32 array."""
        if self._planar is not None:
            from . import pallas_prime_round as ppr

            return np.asarray(
                ppr.round_kernel(self._planar, jnp.int32(self._num_rows)))
        return np.asarray(
            _round_kernel(self._evals, jnp.int32(self._num_rows)))

    def fold(self, challenge) -> None:
        challenge = jnp.asarray(challenge, dtype=jnp.uint32).reshape(4)
        if self._planar is not None:
            from . import pallas_prime_round as ppr

            self._planar = ppr.fold_kernel(self._planar, challenge,
                                           jnp.int32(self._num_rows))
            self._num_rows //= 2
            self.round += 1
            if self._num_rows < 2 * ppr.TB * ppr.LANES:
                # tail handoff: one layout conversion, then jnp kernels
                live = self._planar[:, :, :self._num_rows // ppr.LANES]
                self._evals = ppr.aos_from_planar(live)
                self._planar = None
            return
        self._evals = _fold_kernel(self._evals, challenge,
                                   jnp.int32(self._num_rows))
        self._num_rows //= 2
        self.round += 1


def interpolate_at_host(challenge, points) -> np.ndarray:
    """Quadratic interpolation at `challenge` given p(0), p(1), p(2).

    cf. interpolate_at (prime_field_sumcheck/utils/interpolate.hpp:5-8):
    p(x) = x(x-1)e2/2 - x(x-2)e1 + (x-1)(x-2)e0/2.
    """
    from ..fields.m31 import qm31_add_host, qm31_mul_host, qm31_sub_host

    x = np.asarray(challenge, dtype=np.uint32)
    e0, e1, e2 = (np.asarray(p, dtype=np.uint32) for p in points)
    one = np.array([1, 0, 0, 0], np.uint32)
    two = np.array([2, 0, 0, 0], np.uint32)
    half = np.array([ONE_HALF, 0, 0, 0], np.uint32)
    xm1 = qm31_sub_host(x, one)
    xm2 = qm31_sub_host(x, two)
    t2 = qm31_mul_host(qm31_mul_host(qm31_mul_host(x, xm1), e2), half)
    t1 = qm31_mul_host(qm31_mul_host(x, xm2), e1)
    t0 = qm31_mul_host(qm31_mul_host(qm31_mul_host(xm1, xm2), e0), half)
    return qm31_add_host(qm31_sub_host(t2, t1), t0)
