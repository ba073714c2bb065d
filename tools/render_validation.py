"""Render TPU_VALIDATION.jsonl into TPU_VALIDATION.md (latest result per
config wins; sorted tables per suite)."""

import json
import os
from collections import OrderedDict

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _plausible(r) -> bool:
    """Drop physically impossible timing rows (tunnel-sync artifacts from
    the pre-guard device_time: e.g. '0.0 s' / 2.5e14 butterflies/s at
    log 15 — ~250x the VPU speed of light).  device_time now raises on
    these; old rows in the log are filtered here."""
    if "seconds" in r and r["seconds"] < 1e-5:
        return False
    if r.get("butterflies_per_s", 0) > 1e11:
        return False
    return True


def main():
    rows = {}
    with open(os.path.join(ROOT, "TPU_VALIDATION.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if not _plausible(r):
                continue
            key = (r["suite"],) + tuple(
                r.get(k) for k in ("log_h", "log_len", "log_n", "rate",
                                   "num_vars", "composition", "op",
                                   "target", "variant", "phase",
                                   # knob_ab / tile_ab: one row per config
                                   "KB", "KU", "PT", "unroll_hi",
                                   "wide2", "probe_concat",
                                   "round_t", "fold_t", "round_roll"))
            rows[key] = r          # latest wins

    suites = OrderedDict()
    for key in sorted(rows, key=lambda k: tuple((-1, "") if v is None
                                                else ((v, "") if isinstance(
                                                    v, (int, float))
                                                      else (0, v))
                                                for v in k[1:])):
        suites.setdefault(rows[key]["suite"], []).append(rows[key])

    out = ["# TPU validation results (rendered from TPU_VALIDATION.jsonl)",
           "", "All runs on the attached TPU v5e chip; golden digests are "
           "the reference's committed MD5 tables "
           "(src/ulvt/ntt/tests/test_ntt.cu:21-124).", ""]
    for suite, rs in suites.items():
        out.append(f"## {suite}")
        out.append("")
        if suite == "additive_ntt32":
            out.append("| log_h | rate | pass | wall_s |")
            out.append("|---|---|---|---|")
            for r in rs:
                out.append(f"| {r['log_h']} | {r['rate']} | "
                           f"{'PASS' if r['pass'] else '**FAIL**'} | "
                           f"{r['wall_s']} |")
        elif suite == "bb31_ntt":
            out.append("| log_len | pass | wall_s |")
            out.append("|---|---|---|")
            for r in rs:
                out.append(f"| {r['log_len']} | "
                           f"{'PASS' if r['pass'] else '**FAIL**'} | "
                           f"{r['wall_s']} |")
        elif suite == "ntt128_perf":
            out.append("| log_h | seconds | butterflies/s |")
            out.append("|---|---|---|")
            for r in rs:
                out.append(f"| {r['log_h']} | {r['seconds']} | "
                           f"{r['butterflies_per_s']:.3e} |")
        elif suite == "ntt128_golden":
            out.append("| log_h | rate | pass | wall_s |")
            out.append("|---|---|---|---|")
            for r in rs:
                out.append(f"| {r['log_h']} | {r['rate']} | "
                           f"{'PASS' if r['pass'] else '**FAIL**'} | "
                           f"{r.get('wall_s', '')} |")
        elif suite == "sumcheck128_perf":
            out.append("| num_vars | composition | round_ms | fold_ms |")
            out.append("|---|---|---|---|")
            for r in rs:
                out.append(f"| {r['num_vars']} | {r['composition']} | "
                           f"{r['round_ms']} | {r['fold_ms']} |")
        elif suite == "qm31_perf":
            out.append("| num_vars | round_pass | fold_pass | round_ms "
                       "| fold_ms |")
            out.append("|---|---|---|---|---|")
            for r in rs:
                out.append(f"| {r['num_vars']} | "
                           f"{'PASS' if r['round_pass'] else '**FAIL**'} | "
                           f"{'PASS' if r['fold_pass'] else '**FAIL**'} | "
                           f"{r['round_ms']} | {r['fold_ms']} |")
        elif suite == "pm_ab":
            out.append("| target | log_h | rate | variant | golden | "
                       "seconds | butterflies/s | first_result_s |")
            out.append("|---|---|---|---|---|---|---|---|")
            for r in rs:
                out.append(f"| {r['target']} | {r['log_h']} | {r['rate']} | "
                           f"{r['variant']} | {r['golden']} | "
                           f"{r['seconds']} | {r['butterflies_per_s']:.3e} | "
                           f"{r['time_to_first_result_s']} |")
        elif suite == "fieldops":
            out.append("| op | seconds | per_s |")
            out.append("|---|---|---|")
            for r in rs:
                per = r.get("mul_per_s", r.get("inv_per_s"))
                out.append(f"| {r['op']} | {r['seconds']} | {per:.3e} |")
        elif suite == "sumcheck128":
            out.append("| num_vars | composition | pass | protocol_s |")
            out.append("|---|---|---|---|")
            for r in rs:
                if "skipped" in r:
                    out.append(f"| {r['num_vars']} | {r['composition']} | "
                               f"skipped ({r['skipped']}) | — |")
                    continue
                out.append(f"| {r['num_vars']} | {r['composition']} | "
                           f"{'PASS' if r['pass'] else '**FAIL**'} | "
                           f"{r['protocol_s']} |")
        elif suite == "sumcheck128_phases":
            out.append("| num_vars | composition | memcpy_ms | transpose_ms "
                       "| raw_round_ms | raw_fold_ms |")
            out.append("|---|---|---|---|---|---|")
            for r in rs:
                out.append(f"| {r['num_vars']} | {r['composition']} | "
                           f"{r['memcpy_ms']} | {r['transpose_ms']} | "
                           f"{r['raw_round_ms']} | {r['raw_fold_ms']} |")
        elif suite == "knob_ab":
            out.append("| log_h | KB | KU | PT | unroll_hi | wide2 | probe | "
                       "golden20 | seconds | compile_s |")
            out.append("|---|---|---|---|---|---|---|---|---|---|")
            for r in rs:
                # probe rows produce a WRONG transform by design (timing
                # probe) — a golden FAIL there is the expected outcome, not
                # a regression; render it so a FAIL-scan can tell them apart
                if r["golden20_pass"]:
                    gate = "PASS"
                elif r.get("probe_concat"):
                    gate = "FAIL (probe, expected)"
                else:
                    gate = "**FAIL**"
                out.append(f"| {r['log_h']} | {r['KB']} | {r['KU']} | "
                           f"{r['PT']} | {r['unroll_hi']} | "
                           f"{r.get('wide2', 0)} | "
                           f"{'Y' if r['probe_concat'] else ''} | "
                           f"{gate} | "
                           f"{r['seconds']} | {r['compile_s']} |")
        elif suite == "coldstart":
            out.append("| target | log | cold_first_result_s | "
                       "warm_first_result_s | warm_setup_s |")
            out.append("|---|---|---|---|---|")
            for r in rs:
                out.append(f"| {r['target']} | {r['log']} | "
                           f"{r['cold_first_result_s']} | "
                           f"{r['warm_first_result_s']} | "
                           f"{r['warm_setup_s']} |")
        elif suite == "sumcheck_tile_ab":
            out.append("| num_vars | composition | round_t | fold_t | "
                       "rolled | equality | round_ms | fold_ms |")
            out.append("|---|---|---|---|---|---|---|---|")
            for r in rs:
                out.append(f"| {r['num_vars']} | {r['composition']} | "
                           f"{r['round_t']} | {r['fold_t']} | "
                           f"{r.get('round_roll', 0)} | "
                           f"{'PASS' if r['equality_pass'] else '**FAIL**'} |"
                           f" {r['round_ms']} | {r['fold_ms']} |")
        elif suite == "sharded_capacity":
            out.append("| num_vars | composition | devices | pass | "
                       "per_shard_bytes | round0_s | fold_s |")
            out.append("|---|---|---|---|---|---|---|")
            for r in rs:
                out.append(f"| {r['num_vars']} | {r['composition']} | "
                           f"{r['devices']} | "
                           f"{'PASS' if r['pass'] else '**FAIL**'} | "
                           f"{r['per_shard_bytes']} | {r['round0_s']} | "
                           f"{r['fold_s']} |")
        else:
            for r in rs:
                out.append(f"- `{json.dumps(r)}`")
        out.append("")

    path = os.path.join(ROOT, "TPU_VALIDATION.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path} ({sum(len(v) for v in suites.values())} configs)")


if __name__ == "__main__":
    main()
