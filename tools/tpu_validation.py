"""Full-range golden-hash validation drive on real TPU hardware.

Runs the reference's complete NTT golden suites at the sizes the CPU CI
can't reach (cf. src/ulvt/ntt/tests/test_ntt.cu:126-234) plus GF(2^128)
fused-vs-per-stage equality and sumcheck protocol spot checks, and appends
one JSON line per config to the report file.

Usage:
    python tools/tpu_validation.py additive 11 24      # rate 0 and 2
    python tools/tpu_validation.py additive 25 28
    python tools/tpu_validation.py bb31 11 24
    python tools/tpu_validation.py ntt128 20 26        # perf + capacity
    python tools/tpu_validation.py sumcheck 20 24
Results append to TPU_VALIDATION.jsonl.
"""

import hashlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPORT = os.path.join(os.path.dirname(__file__), "..", "TPU_VALIDATION.jsonl")


def _digest(arr) -> str:
    return hashlib.md5(np.asarray(arr).astype("<u4").tobytes()).hexdigest()


def _emit(rec):
    rec["ts"] = round(time.time(), 1)
    with open(REPORT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _setup_cache():
    from binius_ntt_tpu.utils.benchlib import setup_compile_cache

    setup_compile_cache()


def _retry(fn, tries: int = 3, wait: float = 20.0):
    """Retry through transient tunnel/remote-compile failures (HTTP 5xx)."""
    for a in range(tries):
        try:
            return fn()
        except Exception as e:                        # noqa: BLE001
            if a == tries - 1:
                raise
            print(f"retry {a + 1}/{tries} after: {e}", flush=True)
            time.sleep(wait)


def run_additive(lo: int, hi: int, rates=(0, 2)):
    from golden_hashes import ADDITIVE_NTT_HASHES
    from binius_ntt_tpu.ntt.additive import AdditiveNTT
    from binius_ntt_tpu.utils.mt19937 import mt19937_stream

    for rate in rates:
        for log_h in range(lo, hi + 1):
            want = ADDITIVE_NTT_HASHES.get(rate, {}).get(log_h)
            if want is None:
                continue
            x = mt19937_stream(0xDEADBEEF + log_h + rate, 1 << log_h)
            t0 = time.time()
            try:
                out = _retry(
                    lambda: np.asarray(AdditiveNTT(log_h, rate).apply(x)))
            except Exception as e:          # noqa: BLE001 — keep sweeping
                _emit({"suite": "additive_ntt32", "log_h": log_h,
                       "rate": rate, "pass": False, "error": str(e)[:160]})
                continue
            dt = time.time() - t0
            got = _digest(out)
            _emit({"suite": "additive_ntt32", "log_h": log_h, "rate": rate,
                   "golden": want, "got": got, "pass": got == want,
                   "wall_s": round(dt, 2)})
            del out


def run_bb31(lo: int, hi: int):
    from golden_hashes import BB31_NTT_HASHES
    from binius_ntt_tpu.ntt.radix2 import NTTRadix2
    from binius_ntt_tpu.utils.mt19937 import mt19937_stream

    for log_len in range(lo, hi + 1):
        want = BB31_NTT_HASHES.get(log_len)
        if want is None:
            continue
        inp = mt19937_stream(0xDEADBEEF + log_len, 1 << log_len)
        t0 = time.time()
        try:
            out = _retry(
                lambda: np.asarray(NTTRadix2(137, 27, log_len).apply(inp)))
        except Exception as e:              # noqa: BLE001 — keep sweeping
            _emit({"suite": "bb31_ntt", "log_len": log_len, "pass": False,
                   "error": str(e)[:160]})
            continue
        dt = time.time() - t0
        got = _digest(out)
        _emit({"suite": "bb31_ntt", "log_len": log_len, "golden": want,
               "got": got, "pass": got == want, "wall_s": round(dt, 2)})
        del out


def run_bb31_roundtrip(log_n: int = 24):
    """Forward + inverse + 1/n scaling == identity at 2^log_n, timed
    (cf. test_ntt.cu:154-187; reference: 2.665 s at 2^24 on Kaggle GPU)."""
    import jax
    import jax.numpy as jnp

    from binius_ntt_tpu.fields import baby_bear as bb
    from binius_ntt_tpu.ntt.radix2 import NTTRadix2
    from binius_ntt_tpu.utils.benchlib import device_time, _force
    from binius_ntt_tpu.utils.mt19937 import mt19937_stream

    g = 137
    fwd = NTTRadix2(g, 27, log_n)
    inv = NTTRadix2(bb.inv_host(g), 27, log_n)
    n_inv_mont = jnp.uint32(bb.encode_host(
        np.array([bb.inv_host(1 << log_n)], dtype=np.uint32))[0])

    @jax.jit
    def scale(x):
        # x * (1/n): canonical * montgomery(1/n) via one REDC mul
        return bb.mont_mul(x, n_inv_mont)

    x = mt19937_stream(0xDEADBEEF + log_n, 1 << log_n) % np.uint32(bb.P)
    xj = jnp.asarray(x)

    def roundtrip(v):
        return scale(inv.apply(fwd.apply(v)))

    out = np.asarray(_retry(lambda: roundtrip(xj)))
    ok = bool(np.array_equal(out, x))
    best = device_time(lambda: roundtrip(xj), reps=3)
    _emit({"suite": "bb31_roundtrip", "log_n": log_n, "pass": ok,
           "seconds": round(best, 5)})


def run_ntt128(lo: int, hi: int):
    """Fused-vs-per-stage equality at lo; capacity/perf up to hi."""
    import jax
    import jax.numpy as jnp

    from binius_ntt_tpu.layout.bitslicing import bitslice_transpose
    from binius_ntt_tpu.ntt.additive_bitsliced import AdditiveNTT128
    from binius_ntt_tpu.utils.benchlib import device_time
    from binius_ntt_tpu.utils.mt19937 import mt19937_stream

    # fused-vs-per-stage equality: cap at 2^24 — the per-stage reference
    # path's compile cost grows superlinearly with size (the problem the
    # fused path exists to solve) and its device memory would OOM the
    # capacity sweep; bit-exactness at capacity sizes is pinned by the
    # oracle golden digests instead (ntt128_golden).
    eq = min(lo, 24)
    words = mt19937_stream(77, (1 << eq) * 4)
    a = np.asarray(AdditiveNTT128(eq, 0, use_fused=True).apply(words))
    b = np.asarray(AdditiveNTT128(eq, 0, use_fused=False).apply(words))
    _emit({"suite": "ntt128_equality", "log_h": eq,
           "pass": bool(np.array_equal(a, b))})
    del a, b, words

    for log_h in range(lo, hi + 1):
        ntt = AdditiveNTT128(log_h, 0)
        xh = mt19937_stream(0xDEADBEEF + log_h, (1 << log_h) * 4
                            ).reshape(-1, 128)
        if (1 << log_h) * 16 * 4 > 14 * 10**9:
            # capacity sizes: the on-device transpose's HLO temps run
            # ~4x the array (measured 16 GB at 2^28's 4 GB array) —
            # stream it through the device in chunks (one-time prep)
            from binius_ntt_tpu.layout.bitslicing import (
                bitslice_transpose_streamed)

            sliced = bitslice_transpose_streamed(xh)
        else:
            sliced = jax.jit(bitslice_transpose)(jnp.asarray(xh))
        del xh
        jax.block_until_ready(sliced)
        best = device_time(lambda: ntt.apply_sliced(sliced), reps=3)
        bfs = log_h * (1 << (log_h - 1)) / best
        _emit({"suite": "ntt128_perf", "log_h": log_h,
               "seconds": round(best, 5),
               "butterflies_per_s": round(bfs, 0)})
        del sliced


def run_ntt128_golden(lo: int, hi: int, rates=(0, 2)):
    """GF(2^128) golden digest sweep on device — the same class of evidence
    the GF(2^32) transform has from the reference's table (test_ntt.cu:52-
    124); digests minted by the native C++ oracle (tools/gen_golden128.py),
    which reproduces the reference's GF(2^32) table before minting."""
    from golden_hashes_oracle import ADDITIVE_NTT128_HASHES
    from binius_ntt_tpu.ntt.additive_bitsliced import AdditiveNTT128
    from binius_ntt_tpu.utils.mt19937 import mt19937_stream

    # the bit-sliced device transform's domain starts at one 32-element
    # batch (log_h >= 5); the committed log_h 1..4 digests are pinned on
    # CPU by tests/test_golden_oracle.py instead
    for rate in rates:
        for log_h in range(max(lo, 5), hi + 1):
            want = ADDITIVE_NTT128_HASHES.get(rate, {}).get(log_h)
            if want is None:
                continue
            words = mt19937_stream(0xDEADBEEF + log_h + rate,
                                   (1 << log_h) * 4)
            t0 = time.time()
            try:
                out = _retry(lambda: np.asarray(
                    AdditiveNTT128(log_h, rate).apply(words)))
            except Exception as e:          # noqa: BLE001 — keep sweeping
                _emit({"suite": "ntt128_golden", "log_h": log_h,
                       "rate": rate, "pass": False, "error": str(e)[:160]})
                continue
            got = _digest(out)
            _emit({"suite": "ntt128_golden", "log_h": log_h, "rate": rate,
                   "golden": want, "got": got, "pass": got == want,
                   "wall_s": round(time.time() - t0, 2)})
            del out


def run_rates(log_h32: int = 16, log_h128: int = 16):
    """Value-level device pins for rates 1/3/4 (the reference accepts
    log_rate in [0,4], nttconf.cuh:55-60, but commits goldens only for 0
    and 2; these digests come from the native oracle)."""
    from golden_hashes_oracle import (ADDITIVE_NTT32_EXTRA_HASHES,
                                      ADDITIVE_NTT128_HASHES)
    from binius_ntt_tpu.ntt.additive import AdditiveNTT
    from binius_ntt_tpu.ntt.additive_bitsliced import AdditiveNTT128
    from binius_ntt_tpu.utils.mt19937 import mt19937_stream

    for rate in (1, 3, 4):
        want = ADDITIVE_NTT32_EXTRA_HASHES[rate][log_h32]
        x = mt19937_stream(0xDEADBEEF + log_h32 + rate, 1 << log_h32)
        got = _digest(_retry(
            lambda: np.asarray(AdditiveNTT(log_h32, rate).apply(x))))
        _emit({"suite": "additive_ntt32_rates", "log_h": log_h32,
               "rate": rate, "golden": want, "got": got,
               "pass": got == want})
        want = ADDITIVE_NTT128_HASHES[rate][log_h128]
        w = mt19937_stream(0xDEADBEEF + log_h128 + rate, (1 << log_h128) * 4)
        got = _digest(_retry(
            lambda: np.asarray(AdditiveNTT128(log_h128, rate).apply(w))))
        _emit({"suite": "ntt128_rates", "log_h": log_h128, "rate": rate,
               "golden": want, "got": got, "pass": got == want})


def run_sumcheck_perf(num_vars: int = 24, comp: int = 2):
    """Committed steady-state sumcheck round benchmark: mean device time of
    one full round (messages + fold) at constant buffer occupancy, warm
    cache, excluding compile — the number PERF.md cites.  Uses the same
    fixed-shape Pallas kernels the protocol dispatches to."""
    import jax
    import jax.numpy as jnp

    from binius_ntt_tpu.sumcheck import pallas_round as pr
    from binius_ntt_tpu.sumcheck.prover import INTS_PER_VALUE, Sumcheck
    from binius_ntt_tpu.utils.benchlib import device_time
    from binius_ntt_tpu.utils.mt19937 import mt19937_stream

    evals = mt19937_stream(7, INTS_PER_VALUE * (1 << num_vars) * comp)
    # One capacity gate for both OOM hazards: whenever TWO full eval
    # buffers don't fit HBM, (a) feed DATA_IS_TRANSPOSED input (the
    # ctor's on-device transpose holds in+out buffers) and (b) time the
    # fold at the post-shrink steady-state shape below.  Timing is
    # layout-origin-independent.
    two_buffers_bytes = 2 * comp * (1 << num_vars) * 16
    capacity_limited = two_buffers_bytes > 14 * 10**9
    s = Sumcheck(evals, comp, num_vars, data_is_transposed=capacity_limited)
    rows = (1 << num_vars) // 32
    challenge = jnp.asarray(mt19937_stream(11, INTS_PER_VALUE))

    buf0 = s._device_evals
    t_round = device_time(
        lambda: pr.round_kernel(buf0, jnp.int32(rows), num_points=comp + 1))
    # Fold timing at the protocol's steady-state shape.  The
    # full-occupancy non-shrinking fold needs in + out = 2 full buffers;
    # at capacity sizes (2^28 C=2: 2 x 8 GB) that exceeds HBM — the real
    # protocol's FIRST fold shrinks into a fresh half buffer (12 GB
    # peak) and every later round folds the half-size buffer.  So when 2
    # full buffers don't fit, do the one-time shrinking fold and time
    # the steady state at the post-shrink shape (rounds 2+).
    fold_rows = rows
    if capacity_limited:
        # release the prover's reference to the original buffer before
        # donating it — a lingering reference pins gigabytes at 2^28
        s._device_evals = None
        del s
        buf0 = pr.fold_kernel(buf0, challenge, jnp.int32(rows), shrink=True)
        fold_rows = rows // 2
    state = {"buf": buf0}

    def fold_step():
        state["buf"] = pr.fold_kernel(state["buf"], challenge,
                                      jnp.int32(fold_rows))
        return state["buf"]

    t_fold = device_time(fold_step)
    rec = {"suite": "sumcheck128_perf", "num_vars": num_vars,
           "composition": comp,
           "round_ms": round(t_round * 1e3, 4),
           "fold_ms": round(t_fold * 1e3, 4)}
    if fold_rows == rows:
        rec["round_plus_fold_ms"] = round((t_round + t_fold) * 1e3, 4)
    else:
        # round measured at full occupancy, fold at the post-shrink
        # steady state — their sum corresponds to no actual protocol
        # round, so it is deliberately not emitted
        rec["fold_at_live_rows"] = fold_rows
    _emit(rec)


def run_sumcheck_phases(*num_vars_list):
    """Per-phase sumcheck benchmark matching the reference bench harness's
    memcpy / transpose / raw segmentation (its PhaseTimer-equivalent rows:
    src/ulvt/sumcheck/bench/benchmark.cu:37-45, fed by the chrono
    timestamps at sumcheck.cuh:76-124).  memcpy = host->device upload of
    the untransposed evaluations; transpose = the on-device bit-slicing
    pass the !DATA_IS_TRANSPOSED ctor pays; raw = one steady-state round +
    fold at full occupancy."""
    import jax
    import jax.numpy as jnp

    from binius_ntt_tpu.sumcheck import pallas_round as pr
    from binius_ntt_tpu.sumcheck.prover import (
        BITS_WIDTH, INTS_PER_VALUE, _transpose_kernel)
    from binius_ntt_tpu.utils.benchlib import device_time, _force
    from binius_ntt_tpu.utils.mt19937 import mt19937_stream

    # backend/tunnel warmup: the first transfer in a fresh process pays
    # PJRT client init and any tunnel reconnect — never let that land in
    # a timed row (the round-4 sweep committed a 99 s 'memcpy' this way)
    _force(jnp.zeros((8, BITS_WIDTH), jnp.uint32) + jnp.uint32(1))

    for num_vars in num_vars_list:
        num_vars = int(num_vars)
        for comp in (2, 3, 4):
            evals = mt19937_stream(
                7 + comp, INTS_PER_VALUE * (1 << num_vars) * comp)
            arr = evals.reshape(comp, -1, BITS_WIDTH)
            rows = (1 << num_vars) // 32

            # memcpy: H2D upload, forced via a readback of a tiny slice
            # (block_until_ready is unreliable through the tunnel);
            # median of 3 fresh uploads so one tunnel hiccup cannot
            # masquerade as the steady transfer rate
            samples = []
            for rep in range(3):
                t0 = time.time()
                dev = jnp.asarray(arr)
                _force(dev)
                samples.append(time.time() - t0)
                if rep < 2:
                    del dev
            memcpy_s = sorted(samples)[1]

            _force(_transpose_kernel(dev))     # compile
            transpose_s = device_time(lambda: _transpose_kernel(dev), reps=3)
            sliced = _transpose_kernel(dev)
            del dev

            challenge = jnp.asarray(mt19937_stream(11, INTS_PER_VALUE))
            t_round = device_time(lambda: pr.round_kernel(
                sliced, jnp.int32(rows), num_points=comp + 1))
            state = {"buf": sliced}

            def fold_step():
                state["buf"] = pr.fold_kernel(state["buf"], challenge,
                                              jnp.int32(rows))
                return state["buf"]

            t_fold = device_time(fold_step)
            _emit({"suite": "sumcheck128_phases", "num_vars": num_vars,
                   "composition": comp,
                   "memcpy_ms": round(memcpy_s * 1e3, 2),
                   "transpose_ms": round(transpose_s * 1e3, 4),
                   "raw_round_ms": round(t_round * 1e3, 4),
                   "raw_fold_ms": round(t_fold * 1e3, 4)})
            del sliced, state


def run_sumcheck(*num_vars_list):
    """Full protocol with verifier-oracle round checks on TPU.

    cf. the reference suites at 20/24 vars (sumcheck/test/test.cu:103-129).
    """
    from binius_ntt_tpu.sumcheck.prover import INTS_PER_VALUE, Sumcheck
    from binius_ntt_tpu.sumcheck.verifier import (
        evaluate_univariate_given_points, words_to_int)
    from binius_ntt_tpu.utils.mt19937 import mt19937_stream

    for num_vars in num_vars_list:
        num_vars = int(num_vars)
        for comp in (2, 3, 4):
            total_bytes = (1 << num_vars) * 16 * comp
            # single-chip HBM gate: the protocol holds the full (C, B, 128)
            # buffer for its whole life; past ~12 GB the config is the
            # sharded provers' territory (SCALING.md §4 — the reference
            # RECORDED this failure at 28 vars, result.txt tail)
            if total_bytes > 12 * 10**9:
                _emit({"suite": "sumcheck128", "num_vars": num_vars,
                       "composition": comp, "skipped": "exceeds_hbm",
                       "bytes": total_bytes})
                continue
            evals = mt19937_stream(
                41 + num_vars + comp, INTS_PER_VALUE * (1 << num_vars) * comp)
            t0 = time.time()
            if total_bytes > 6 * 10**9:
                # fits resident, but the ctor's whole-array device
                # transpose peaks >= 2x the buffer — stream it instead
                from binius_ntt_tpu.layout.bitslicing import (
                    bitslice_transpose_streamed_cols)

                sliced = bitslice_transpose_streamed_cols(
                    evals.reshape(comp, -1, 128))
                s = Sumcheck(sliced, comp, num_vars,
                             data_is_transposed=True)
                del sliced
            else:
                s = Sumcheck(evals, comp, num_vars)
            setup_s = time.time() - t0
            rng = np.random.default_rng(7)
            claim = None
            ok = True
            t0 = time.time()
            round_times = []
            for rnd in range(num_vars):
                t1 = time.time()
                total, pts = s.round_messages()
                if claim is not None:
                    want = claim
                    got = words_to_int(total)
                    ok = ok and (got == want)
                p01 = words_to_int(pts[0]) ^ words_to_int(pts[1])
                ok = ok and (words_to_int(total) == p01)
                challenge = rng.integers(
                    0, 2 ** 32, size=4, dtype=np.uint32)
                claim = evaluate_univariate_given_points(
                    words_to_int(challenge),
                    [words_to_int(p) for p in pts], comp + 1)
                s.move_to_next_round(challenge)
                round_times.append(time.time() - t1)
            proto_s = time.time() - t0
            _emit({"suite": "sumcheck128", "num_vars": num_vars,
                   "composition": comp, "pass": bool(ok),
                   "setup_s": round(setup_s, 2),
                   "protocol_s": round(proto_s, 2),
                   "round0_s": round(round_times[0], 4),
                   "mean_round_s": round(float(np.mean(round_times)), 4)})


def run_fieldops():
    """Raw multiply throughput at 2^24 elements (cf. the reference's GPU
    field-op kernels over 2^24 x 16 muls, finite_fields/tests/
    test_kernels.cu:81-221; BASELINE.md rows 6-10)."""
    import jax
    import jax.numpy as jnp

    from binius_ntt_tpu.ntt.pallas_kernels import mul_tiles
    from binius_ntt_tpu.utils.benchlib import device_time, _force

    rng = np.random.default_rng(3)
    # GF(2^128) bit-sliced: (2^19, 128) sliced batches = 2^24 elements
    # (jit the wrapper: an eager pallas_call re-traces the 15k-op kernel
    # body every invocation, ~3.7 s/call of pure host overhead)
    a = jnp.asarray(rng.integers(0, 2 ** 32, size=(1 << 19, 128),
                                 dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2 ** 32, size=(1 << 19, 128),
                                 dtype=np.uint32))
    mt = jax.jit(mul_tiles)
    _force(mt(a, b))
    t = device_time(lambda: mt(a, b), reps=6)
    _emit({"suite": "fieldops", "op": "mul128_bitsliced_2^24",
           "seconds": round(t, 5),
           "mul_per_s": round((1 << 24) / t)})

    # GF(2^32) compact SWAR multiply and tower inverse, 2^24 elements
    # (cf. test_kernels.cu:81-115 mul 1.641 s, :223-255 inverse 0.879 s)
    from binius_ntt_tpu.fields.tower_simd import inverse_packed, mul_packed

    g = jnp.asarray(rng.integers(0, 2 ** 32, size=1 << 24, dtype=np.uint32))
    h2 = jnp.asarray(rng.integers(0, 2 ** 32, size=1 << 24, dtype=np.uint32))
    mp = jax.jit(lambda u, v: mul_packed(u, v, 5))
    _force(mp(g, h2))
    t = device_time(lambda: mp(g, h2), reps=6)
    _emit({"suite": "fieldops", "op": "mul32_swar_2^24",
           "seconds": round(t, 5), "mul_per_s": round((1 << 24) / t)})
    ip = jax.jit(lambda u: inverse_packed(u, 5))
    _force(ip(g))
    t = device_time(lambda: ip(g), reps=6)
    _emit({"suite": "fieldops", "op": "inverse32_2^24",
           "seconds": round(t, 5), "inv_per_s": round((1 << 24) / t)})

    # BB31 Montgomery multiply, 2^24 elements
    from binius_ntt_tpu.fields import baby_bear as bb

    x = jnp.asarray(rng.integers(0, bb.P, size=1 << 24, dtype=np.uint32))
    y = jnp.asarray(rng.integers(0, bb.P, size=1 << 24, dtype=np.uint32))
    mm = jax.jit(bb.mont_mul)
    _force(mm(x, y))
    t = device_time(lambda: mm(x, y), reps=6)
    _emit({"suite": "fieldops", "op": "bb31_mont_mul_2^24",
           "seconds": round(t, 5),
           "mul_per_s": round((1 << 24) / t)})

    # chained (ALU-bound) variants: 16 dependent muls per element — the
    # reference's kernels chain muls per thread the same way
    # (test_kernels.cu:81-221 does 16, the nvbench kernels 50k)
    @jax.jit
    def chain16_swar(u, v):
        for _ in range(16):
            u = mul_packed(u, v, 5)
        return u

    @jax.jit
    def chain16_bb31(u, v):
        for _ in range(16):
            u = bb.mont_mul(u, v)
        return u

    for name, fn, args in (("mul32_swar_chain16", chain16_swar, (g, h2)),
                           ("bb31_mont_mul_chain16", chain16_bb31, (x, y))):
        _force(fn(*args))
        t = device_time(lambda: fn(*args), reps=6)
        _emit({"suite": "fieldops", "op": name + "_2^24",
               "seconds": round(t, 5),
               "mul_per_s": round(16 * (1 << 24) / t)})


def run_qm31_perf(num_vars: int = 24):
    """Committed steady-state QM31 round benchmark on the fused planar
    Pallas kernels (sumcheck/pallas_prime_round.py): equality-pins the
    fused round against the validated jnp kernel at full occupancy, then
    reports warm round/fold device time — the QM31 analogue of
    sumcheck_perf (reference counterpart: get_round_coefficients +
    fold_list_halves, prime_field_sumcheck/core/kernels.cu:5-78)."""
    import jax.numpy as jnp

    from binius_ntt_tpu.fields.m31 import P
    from binius_ntt_tpu.sumcheck import pallas_prime_round as ppr
    from binius_ntt_tpu.sumcheck.prime_field import _round_kernel
    from binius_ntt_tpu.utils.benchlib import device_time

    rng = np.random.default_rng(23 + num_vars)
    rows = 1 << num_vars
    evals = jnp.asarray(
        rng.integers(0, P, size=(2, rows, 4), dtype=np.uint32))
    planar = ppr.planar_from_aos(evals)
    ch = jnp.asarray(rng.integers(0, P, size=4, dtype=np.uint32))

    want = np.asarray(_round_kernel(evals, jnp.int32(rows)))
    got = np.asarray(ppr.round_kernel(planar, jnp.int32(rows)))
    round_ok = bool(np.array_equal(got, want))
    t_round = device_time(lambda: ppr.round_kernel(planar, jnp.int32(rows)))

    # fold equality on the live prefix, then timing at constant occupancy
    folded = np.asarray(ppr.fold_kernel_impl(planar, ch, jnp.int32(rows)))
    want_f = np.asarray(ppr.fold_emulate(planar, ch, rows))
    half = rows // ppr.LANES // 2
    fold_ok = bool(np.array_equal(folded[:, :, :half], want_f[:, :, :half]))

    state = {"buf": planar}

    def fold_step():
        state["buf"] = ppr.fold_kernel(state["buf"], ch, jnp.int32(rows))
        return state["buf"]

    t_fold = device_time(fold_step)
    _emit({"suite": "qm31_perf", "num_vars": num_vars,
           "round_pass": round_ok, "fold_pass": fold_ok,
           "round_ms": round(t_round * 1e3, 4),
           "fold_ms": round(t_fold * 1e3, 4),
           "round_plus_fold_ms": round((t_round + t_fold) * 1e3, 4)})


def run_prime(*num_vars_list):
    """QM31 sumcheck full protocol on device (cf. the reference's 24-var
    run, prime_field_sumcheck/test_sumcheck.cu:9-99)."""
    from binius_ntt_tpu.sumcheck.prime_field import (
        PrimeFieldSumcheck, interpolate_at_host)
    from binius_ntt_tpu.fields.m31 import P, qm31_add_host, qm31_mul_host

    for num_vars in num_vars_list:
        num_vars = int(num_vars)
        rng = np.random.default_rng(17 + num_vars)
        evals = rng.integers(0, P, size=(2, 1 << num_vars, 4),
                             dtype=np.uint32)
        t0 = time.time()
        s = PrimeFieldSumcheck(evals)
        claim, ok = None, True
        rts = []
        for rnd in range(num_vars):
            t1 = time.time()
            pts = s.round_messages()
            p01 = qm31_add_host(pts[0], pts[1])
            if claim is not None:
                ok = ok and bool(np.array_equal(p01, claim))
            ch = rng.integers(0, P, size=4, dtype=np.uint32)
            claim = interpolate_at_host(ch, pts)
            s.fold(ch)
            rts.append(time.time() - t1)
        _emit({"suite": "qm31_sumcheck", "num_vars": num_vars,
               "pass": bool(ok), "protocol_s": round(time.time() - t0, 2),
               "mean_round_s": round(float(np.mean(rts)), 4),
               "min_round_s": round(float(np.min(rts)), 4)})


def main():
    _setup_cache()
    which = sys.argv[1]
    args = [int(a) for a in sys.argv[2:]]
    if which == "additive":
        run_additive(*args)
    elif which == "bb31":
        run_bb31(*args)
    elif which == "ntt128":
        run_ntt128(*args)
    elif which == "ntt128_golden":
        # optional 3rd arg restricts to a single rate (resume after a
        # timeout without re-running completed (size, rate) pins)
        if len(args) == 3:
            run_ntt128_golden(args[0], args[1], rates=(args[2],))
        else:
            run_ntt128_golden(*args)
    elif which == "rates":
        run_rates(*args)
    elif which == "sumcheck_perf":
        run_sumcheck_perf(*args)
    elif which == "sumcheck_phases":
        run_sumcheck_phases(*args)
    elif which == "sumcheck":
        run_sumcheck(*args)
    elif which == "prime":
        run_prime(*args)
    elif which == "qm31_perf":
        run_qm31_perf(*args)
    elif which == "bb31_roundtrip":
        run_bb31_roundtrip(*args)
    elif which == "fieldops":
        run_fieldops()
    else:
        raise SystemExit(f"unknown suite {which}")


if __name__ == "__main__":
    main()
