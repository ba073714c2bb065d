"""Child process for tools/coldstart.py: one time-to-first-result sample.

Prints ONE JSON line: {target, first_result_s, setup_s, import_s} where
first_result_s = process start -> first forced device result of the target
kernel (the latency a fresh user process pays), setup_s = everything
before the target kernel's first call (imports, backend init, input
upload/prep — which may itself compile small programs), import_s = module
imports + jax backend config only.

The compilation cache location is taken from BNTT_CACHE_DIR (see
binius_ntt_tpu/utils/benchlib.py) — the parent points it at an empty temp
dir for cold samples and at the repo cache for warm ones.
"""

import json
import os
import sys
import time

# invoked as a script path: python adds tools/ to sys.path, not the repo
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def main() -> None:
    target = sys.argv[1]
    log = int(sys.argv[2]) if len(sys.argv) > 2 else 24

    from binius_ntt_tpu.utils.benchlib import _force, setup_compile_cache

    setup_compile_cache()
    import jax
    import jax.numpy as jnp

    from binius_ntt_tpu.utils.mt19937 import mt19937_stream

    t_import = time.time() - T0

    if target == "ntt128":
        from binius_ntt_tpu.layout.bitslicing import bitslice_transpose
        from binius_ntt_tpu.ntt.additive_bitsliced import AdditiveNTT128

        ntt = AdditiveNTT128(log, 0)
        x = mt19937_stream(0xDEADBEEF + log, (1 << log) * 4).reshape(-1, 128)
        sliced = jax.jit(bitslice_transpose)(jnp.asarray(x))
        jax.block_until_ready(sliced)
        t_setup = time.time() - T0
        _force(ntt.apply_sliced(sliced))
    elif target == "sumcheck":
        from binius_ntt_tpu.sumcheck import pallas_round as pr
        from binius_ntt_tpu.sumcheck.prover import INTS_PER_VALUE, Sumcheck

        comp = 2
        evals = mt19937_stream(7, INTS_PER_VALUE * (1 << log) * comp)
        s = Sumcheck(evals, comp, log)
        t_setup = time.time() - T0
        _force(pr.round_kernel(s._device_evals,
                               jnp.int32((1 << log) // 32),
                               num_points=comp + 1))
    elif target == "bb31":
        from binius_ntt_tpu.ntt.radix2 import NTTRadix2

        ntt = NTTRadix2(137, 27, log)
        x = jnp.asarray(mt19937_stream(0xDEADBEEF + log, 1 << log))
        jax.block_until_ready(x)
        t_setup = time.time() - T0
        _force(ntt.apply(x))
    else:
        raise SystemExit(f"unknown target {target}")

    print(json.dumps({
        "target": target, "log": log,
        "first_result_s": round(time.time() - T0, 2),
        "setup_s": round(t_setup, 2),
        "import_s": round(t_import, 2),
    }))


if __name__ == "__main__":
    main()
