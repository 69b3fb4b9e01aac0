"""One-command revalidation of the shipped "auto" performance tables.

Two framework defaults encode measured per-preset wins whose smallest
cells sit only 1-2x above the documented ±4% session noise:

  * ``TrainConfig.grad_accum_steps="auto"`` -> {geo: 8, knowledge: 2,
    news: 8} at batch >= 256 on TPU (train/step.py::resolve_grad_accum);
  * ``DecodeConfig.kv_dtype="auto"`` -> int8 on news/TPU only
    (decode/beam.py::resolve_kv_dtype).

On new hardware (a different TPU generation, a different host) those
tables should be re-established, not trusted.  This harness re-runs BOTH
interleaved A/Bs (benchmarks/grad_accum_ab.py and benchmarks/int8_kv_ab.py
— same controlled methodology: one session, round-robin timing so drift
hits every variant equally) and prints, per preset, the re-measured best
variant next to the shipped default with a LOOKS-GOOD / RETUNE verdict.

A variant only flags RETUNE when it beats the shipped default by more
than ``--noise-pct`` (default 4, the documented tunnel session noise) —
within-noise reshuffles are expected and not actionable.

Usage:
    python benchmarks/revalidate_autos.py                  # full (slow)
    python benchmarks/revalidate_autos.py --which accum    # one table
    python benchmarks/revalidate_autos.py --presets georic --iters 4
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PRESET_VARIANTS = {"georic": "geo", "k_georic": "knowledge",
                   "nytimes800k": "news"}


def revalidate_grad_accum(presets, batch, iters, chunk, noise_pct):
    import grad_accum_ab

    from icek_tpu.train import step as step_lib

    report = []
    for preset in presets:
        shipped = step_lib.resolve_grad_accum(
            "auto", PRESET_VARIANTS[preset], batch
        )
        pairs = [(batch, a) for a in (1, 2, 4, 8)]
        res = grad_accum_ab.run_preset(preset, pairs, iters, chunk)
        rates = {a: res[f"accum{a}_samples_per_sec"] for _, a in pairs}
        best = max(rates, key=rates.get)
        margin = 100.0 * (rates[best] / rates[shipped] - 1.0)
        report.append({
            "table": "grad_accum", "preset": preset, "batch": batch,
            "shipped": shipped, "shipped_samples_per_sec": rates[shipped],
            "best_measured": best, "best_samples_per_sec": rates[best],
            "best_vs_shipped_pct": round(margin, 1),
            "verdict": "LOOKS-GOOD" if margin <= noise_pct else "RETUNE",
            "all": rates,
        })
    return report


def revalidate_kv_dtype(presets, batch, beam, iters, noise_pct):
    import dataclasses

    import int8_kv_ab

    from icek_tpu.core import config as config_lib
    from icek_tpu.decode import beam as beam_lib

    report = []
    for preset in presets:
        cfg = config_lib.get_config(preset)
        shipped = beam_lib.resolve_kv_dtype("auto", cfg.model) or "bf16"
        res = int8_kv_ab.run_preset(preset, batch, beam, iters)
        rates = {v or "bf16": res[f"{v or 'bf16'}_caps_per_sec"]
                 for v in int8_kv_ab.VARIANTS}
        best = max(rates, key=rates.get)
        margin = 100.0 * (rates[best] / rates[shipped] - 1.0)
        report.append({
            "table": "kv_dtype", "preset": preset, "batch": batch,
            "beam": beam,
            "shipped": shipped, "shipped_caps_per_sec": rates[shipped],
            "best_measured": best, "best_caps_per_sec": rates[best],
            "best_vs_shipped_pct": round(margin, 1),
            "verdict": "LOOKS-GOOD" if margin <= noise_pct else "RETUNE",
            "all": rates,
        })
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", choices=["accum", "kv", "both"],
                    default="both")
    ap.add_argument("--presets", nargs="*",
                    default=["georic", "k_georic", "nytimes800k"])
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--chunk", type=int, default=15)
    ap.add_argument("--noise-pct", type=float, default=4.0,
                    help="margin a challenger must beat the shipped "
                         "default by before RETUNE flags (the documented "
                         "session noise)")
    args = ap.parse_args()
    bad = [p for p in args.presets if p not in PRESET_VARIANTS]
    if bad:
        ap.error(f"unknown presets {bad}; pick from {list(PRESET_VARIANTS)}")

    report = []
    if args.which in ("accum", "both"):
        report += revalidate_grad_accum(
            args.presets, args.batch, args.iters, args.chunk, args.noise_pct
        )
    if args.which in ("kv", "both"):
        report += revalidate_kv_dtype(
            args.presets, args.batch, args.beam, args.iters, args.noise_pct
        )
    print(json.dumps(report, indent=2))
    retune = [r for r in report if r["verdict"] == "RETUNE"]
    if retune:
        print(f"\n{len(retune)} table cell(s) beat the shipped default by "
              f"more than {args.noise_pct}% — consider retuning "
              "resolve_grad_accum / resolve_kv_dtype for this hardware:",
              file=sys.stderr)
        for r in retune:
            print(f"  {r['table']}/{r['preset']}: shipped {r['shipped']} "
                  f"-> measured best {r['best_measured']} "
                  f"(+{r['best_vs_shipped_pct']}%)", file=sys.stderr)


if __name__ == "__main__":
    main()
