"""Classical radix-2 DIF NTT over a 32-bit prime field (BB31) — TPU-native.

Same transform as the reference's ``NTT<BB31>`` (src/ulvt/ntt/gpuntt.cuh:126-209):
  * twiddles: n/2 powers of omega = g^(2^(log_group_order - log_n)), stored in
    bit-reversed order (gpuntt.cuh:139-143,186-204);
  * input is bit-reversed if IN_ORDER (gpuntt.cuh:163-168);
  * stages ascend 0..log_n-1; at stage s butterflies pair indices
    (g, g + 2^s) with g = (e % 2^s) | ((e >> s) << (s+1)), twiddle index
    (e >> s) mod (twiddle_size >> s) (gpuntt.cuh:54-63,111-118);
  * butterfly U = u + v ; V = (u - v) * w (gpuntt.cuh:39-44).

TPU formulation: the per-stage index algebra collapses to a reshape —
view the array as (blocks, 2, 2^s); the twiddle vector for stage s is simply
the first ``blocks`` bit-reversed twiddles.  The whole transform (including
Montgomery encode/decode at the boundary) is one jitted program; the
bit-reversal permutation is a precomputed gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import baby_bear as bb

__all__ = ["NTTRadix2", "bit_reverse_indices"]


def bit_reverse_indices(log_n: int) -> np.ndarray:
    """Permutation idx[i] = reverse of i's low log_n bits; gpuntt.cuh:12-19."""
    n = 1 << log_n
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


def _geometric_powers(base: int, count: int, p: int) -> np.ndarray:
    """[1, base, base^2, ...] mod p, vectorised by doubling."""
    out = np.array([1], dtype=np.uint64)
    step = base % p
    while out.size < count:
        out = np.concatenate([out, (out * np.uint64(step)) % np.uint64(p)])
        step = (step * step) % p
    return out[:count].astype(np.uint32)


class NTTRadix2:
    """Radix-2 NTT over BB31 with generator `g` of order 2^log_group_order."""

    def __init__(self, generator: int, log_group_order: int, log_n: int):
        # validation mirrors NTTConfRad2 (nttconf.cuh:32-39)
        if not 1 <= log_n <= 27:
            raise ValueError("log_n must be in [1, 27]")
        if not log_group_order >= log_n:
            raise ValueError("log_group_order must be >= log_n")
        self.log_n = log_n
        n = 1 << log_n

        omega = bb.pow_host(generator, 1 << (log_group_order - log_n))
        tw = _geometric_powers(omega, n // 2, bb.P)
        # bit-reverse with idx_size = log_n - 1 (gpuntt.cuh:141-142)
        if log_n > 1:
            tw = tw[bit_reverse_indices(log_n - 1)]
        self._tw_mont = jnp.asarray(bb.encode_host(tw))
        self._bitrev = jnp.asarray(bit_reverse_indices(log_n))
        self._apply = partial(_radix2_apply, log_n=log_n)

    def apply(self, x, input_bit_reversed: bool = False):
        """x: (2^log_n,) canonical uint32 values -> IN_ORDER transform output.

        `input_bit_reversed=False` matches DataOrder::IN_ORDER (the kernel
        bit-reverses first, gpuntt.cuh:163-168).
        """
        x = jnp.asarray(x, dtype=jnp.uint32)
        assert x.shape == (1 << self.log_n,)
        return self._apply(x, self._tw_mont, self._bitrev,
                           skip_bitrev=input_bit_reversed)


@partial(jax.jit, static_argnames=("log_n", "skip_bitrev"))
def _radix2_apply(x, tw_mont, bitrev, *, log_n: int, skip_bitrev: bool = False):
    n = 1 << log_n
    x = bb.encode(x)  # BB31(uint32) ctor semantics: wrap + Montgomery encode
    if not skip_bitrev:
        x = x[bitrev]
    for s in range(log_n):
        nb = n >> (s + 1)
        v3 = x.reshape(nb, 2, 1 << s)
        u, v = v3[:, 0, :], v3[:, 1, :]
        w = tw_mont[:nb][:, None]
        big_u = bb.add(u, v)
        big_v = bb.mont_mul(bb.sub(u, v), w)
        x = jnp.stack([big_u, big_v], axis=1).reshape(n)
    return bb.decode(x)
