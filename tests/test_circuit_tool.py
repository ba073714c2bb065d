"""Circuit-generator tool: op counts and cross-check against the fields impl.

The generated straight-line program must compute the same function as
fields/bitsliced.py (both evaluate the Karatsuba recursion; the reference's
generated code has M(h) = 3^h ANDs — circuit_generator/constants.hpp and
SURVEY §2 row 5).
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from circuit_generator import emit_python, generate  # noqa: E402

from binius_ntt_tpu.fields import bitsliced as bf  # noqa: E402
from binius_ntt_tpu.utils.mt19937 import mt19937_stream  # noqa: E402


def test_and_counts():
    for h in (0, 1, 2, 5):
        c, *_ = generate(h)
        n_and = sum(1 for o in c.ops if o[0] == "and")
        assert n_and == 3 ** h


def test_generated_matches_fields_impl():
    import jax.numpy as jnp

    h = 5
    w = 1 << h
    src = emit_python(h)
    ns: dict = {}
    exec(src, ns)
    fn = ns[f"multiply_unrolled_h{h}"]

    words = mt19937_stream(321, 2 * w)
    a, b = words[:w], words[w:]
    got = np.stack(fn(list(a), list(b)))
    expect = np.asarray(bf.multiply(jnp.asarray(a), jnp.asarray(b), h))
    assert (got == expect).all()
