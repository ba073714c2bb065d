"""Append-style golden generation: compute individual (log_h, log_rate)
GF(2^128) digests with the native oracle, without regenerating the whole
committed table (tools/gen_golden128.py pays the full sweep; the large-size
tail costs hours per entry on one core).

Same digest convention and self-check as gen_golden128.py.

Usage:  python tools/gen_golden128_tail.py LOG_H:RATE [LOG_H:RATE ...]
"""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from gen_golden128 import _selfcheck, gen128  # noqa: E402


def main() -> None:
    _selfcheck()
    for spec in sys.argv[1:]:
        log_h, log_rate = (int(p) for p in spec.split(":"))
        d = gen128(log_h, log_rate)
        print(f"{log_h}:{log_rate} {d}", flush=True)


if __name__ == "__main__":
    main()
