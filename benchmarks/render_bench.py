#!/usr/bin/env python
"""Render the BENCH.md tables from the head JSON records.

Prints markdown tables built verbatim from BENCH_SUITE.json,
FRAMES_AB_SI.json, BENCH_r0*.json and TPU_PARITY.json so the canonical
bench doc can be regenerated (and audited) against the raw records.
"""
import glob
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    p = os.path.join(ROOT, name)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def suite_table():
    recs = _load("BENCH_SUITE.json") or []
    print("| config | res | step_s | ms/iter | iters | converged | regions | (p,tau) DOFs | compile_s |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in recs:
        dofs = r.get("n_pressures", 0) + r.get("n_stresses", 0)
        res = r.get("crop_res", r["res"])
        res_s = "x".join(str(v) for v in res)
        if "crop_res" in r:
            res_s += " (crop)"
        print(
            f"| {r['config']} | {res_s} | {r['step_s']:.2f} | "
            f"{1000*r['s_per_iteration']:.2f} | {r['iterations']} | "
            f"{'yes' if r['converged'] else 'NO'} | {r.get('n_regions', 0)} | "
            f"{dofs/1e6:.2f} M | {r.get('compile_s', float('nan')):.0f} |"
        )


def frames_table():
    print("| config | steady iters/frame | steady solve wall | steady frame wall | frame/solve |")
    print("|---|---|---|---|---|")
    for name in ("FRAMES_AB_SI.json", "FRAMES_AB_SI_256.json", "FRAMES_AB_SI_256_CROP.json"):
        for r in _load(name) or []:
            steady = r["frames"][2:] or r["frames"]
            wall = sum(f["wall_s"] for f in steady) / len(steady)
            sw = r["steady_mean_solve_wall_s"]
            print(
                f"| {r['config']} | {r['steady_mean_iterations']:.0f} | {sw:.3f} s | "
                f"{wall:.2f} s | {wall/sw:.1f}x |"
            )


def bf16_table():
    print("| scene | config | bf16 | iters | cold wall | warm wall | converged |")
    print("|---|---|---|---|---|---|---|")
    for name in ("BF16_AB_SI.json", "BF16_AB_TOY.json"):
        for r in _load(name) or []:
            print(
                f"| {r['scene']} {r['n']}^3 | {r['config']} | {'on' if r['bf16'] else 'off'} | "
                f"{r['iterations']} | {r['wall_s']:.2f} s | {r['wall_warm_s']:.3f} s | "
                f"{'yes' if r['converged'] else 'NO'} |"
            )
    for r in _load("FRAMES_AB_SI_BF16.json") or []:
        steady = r["frames"][2:] or r["frames"]
        wall = sum(f["wall_s"] for f in steady) / len(steady)
        print(
            f"| warm frames | {r['config']} | on | {r['steady_mean_iterations']:.0f}/frame | "
            f"— | {r['steady_mean_solve_wall_s']:.3f} s solve / {wall:.2f} s frame | — |"
        )


def headline_series():
    print("| round | headline (bench.py) | iters | vs CPU baseline | metric |")
    print("|---|---|---|---|---|")
    for p in sorted(glob.glob(os.path.join(ROOT, "BENCH_r0*.json"))):
        with open(p) as f:
            d = json.load(f)
        d = d.get("parsed", d)
        if not d:
            continue
        print(
            f"| {os.path.basename(p)} | {d.get('value')} {d.get('unit', 's')} | "
            f"{d.get('iterations', '—')} | {d.get('vs_baseline', '—')}x | {d.get('metric')} |"
        )


def parity_summary():
    d = _load("TPU_PARITY.json")
    if not d:
        return
    print(json.dumps({k: d[k] for k in d if k not in ("cases",)}, indent=1)[:400])
    for c in d.get("cases", []):
        keys = [k for k in c if "diff" in k or "rel" in k]
        tag = f"{c.get('scene')} n={c.get('n')} tile={c.get('tile')} reduced={c.get('reduced')} untiled={c.get('untiled')}"
        print(" ", tag, {k: c[k] for k in keys})


if __name__ == "__main__":
    print("## Suite (BENCH_SUITE.json)\n")
    suite_table()
    print("\n## Warm frames (FRAMES_AB_SI.json)\n")
    frames_table()
    print("\n## bf16 coefficient A/B (BF16_AB_*.json)\n")
    bf16_table()
    print("\n## Headline series (BENCH_r0*.json)\n")
    headline_series()
    print("\n## Parity (TPU_PARITY.json)\n")
    parity_summary()
