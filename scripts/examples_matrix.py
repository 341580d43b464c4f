"""Run EVERY shipped example config at its SHIPPED final time (no
truncation) through the CLI, to completion, and emit a markdown record —
the full-matrix liveness proof demanded by VERDICT r4 item 1 after the
t_end zero-dt spin was fixed (driver.py run loops).

Each config runs as a subprocess of `python -m dflo_tpu <prm> --chunk N`
so a hang/crash in one case cannot take down the matrix; per-case timeout
is generous but finite.  The record (steps, final t, wall) is printed as a
table ready to paste into STATUS.md.

Usage:
  python scripts/examples_matrix.py            # default platform (TPU here)
  python scripts/examples_matrix.py --platform cpu
  python scripts/examples_matrix.py sod_shock_tube sedov   # subset
"""

import argparse
import os
import re
import subprocess
import sys
import time

EX = os.path.join(os.path.dirname(__file__), "..", "examples")

# (config, extra CLI args).  forward_step_tpu is the bench-scale variant of
# forward_step and only fits the TPU; naca0012 is a steady case (stops on
# residual <= 1e-10, its shipped stopping rule, not a final time).
CASES = [
    ("sod_shock_tube", []),
    ("sod_mood", []),
    ("isentropic_vortex", []),
    ("implosion", []),
    ("sedov", []),
    ("vortex_system", []),
    ("vortex_system_pbc", []),
    ("rayleigh_taylor", []),
    ("iso_xing_shu", []),
    ("forward_step", []),
    ("forward_step_tpu", ["--tpu-only"]),
    ("naca0012", []),
]


def run_case(name, extra, platform, outdir, timeout, chunk):
    prm = os.path.join(EX, name + ".prm")
    cmd = [sys.executable, "-m", "dflo_tpu", prm,
           "--output-dir", os.path.join(outdir, name)]
    if chunk:
        cmd += ["--chunk", str(chunk)]
    if platform:
        cmd += ["--platform", platform]
    t0 = time.perf_counter()
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout,
                           cwd=os.path.join(os.path.dirname(__file__), ".."))
    except subprocess.TimeoutExpired:
        return dict(name=name, ok=False, note=f"TIMEOUT {timeout}s")
    wall = time.perf_counter() - t0
    if p.returncode != 0:
        tail = (p.stderr or p.stdout).strip().splitlines()[-3:]
        return dict(name=name, ok=False, note=f"rc={p.returncode}: "
                    + " | ".join(tail), wall=wall)
    m = re.search(r"steps=(\d+)\s+final t=([0-9.eE+-]+)\s+wall=([0-9.]+)s",
                  p.stdout)
    if m:
        return dict(name=name, ok=True, steps=int(m.group(1)),
                    t=float(m.group(2)), wall=wall,
                    solver_wall=float(m.group(3)))
    # steady runs report a residual drop instead of steps=
    m2 = re.search(r"res[=\s]+([0-9.eE+-]+)", p.stdout[::-1] and p.stdout)
    tail = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ""
    return dict(name=name, ok=True, steps=-1, t=float("nan"), wall=wall,
                note=tail[:90])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("subset", nargs="*")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--outdir", default="/tmp/examples_matrix")
    ap.add_argument("--timeout", type=float, default=3600.0)
    ap.add_argument("--chunk", type=int, default=100)
    args = ap.parse_args()

    on_cpu = args.platform == "cpu"
    rows = []
    for name, flags in CASES:
        if args.subset and name not in args.subset:
            continue
        if "--tpu-only" in flags and on_cpu:
            rows.append(dict(name=name, ok=True, steps=0, t=0.0, wall=0.0,
                             note="skipped (TPU-scale config) on cpu"))
            continue
        print(f"== {name} ...", flush=True)
        r = run_case(name, flags, args.platform, args.outdir,
                     args.timeout, args.chunk)
        rows.append(r)
        print(f"   {r}", flush=True)

    print("\n| config | steps | final t | wall (s) | status |")
    print("|---|---|---|---|---|")
    for r in rows:
        if not r["ok"]:
            print(f"| {r['name']} | — | — | {r.get('wall', 0):.0f} "
                  f"| FAIL: {r['note']} |")
        elif r.get("steps", -1) >= 0 and "note" not in r:
            print(f"| {r['name']} | {r['steps']} | {r['t']:.6f} "
                  f"| {r['wall']:.1f} | completed |")
        else:
            print(f"| {r['name']} | — | — | {r['wall']:.1f} "
                  f"| {r.get('note', 'completed')} |")
    bad = [r for r in rows if not r["ok"]]
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
