"""Capture and summarise an xprof trace of the production map-build step.

Complements tools/profile_step.py (wall-clock per segment): this captures a
real device trace via jax.profiler and aggregates the TPU compute line per
op / per category, which is how the r3 kernel work was attributed (see
docs/PROFILE.md).  Usage:

  python tools/trace_step.py                 # trace + category summary
  python tools/trace_step.py --per-op        # add top-op table
  python tools/trace_step.py --trace-dir /tmp/xtrace --reps 3

The trace directory can also be opened in TensorBoard/XProf off-host.
"""

from __future__ import annotations

import argparse
import collections
import glob
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def capture(trace_dir: str, reps: int, whole: bool = False):
    import jax
    import jax.numpy as jnp

    from avlmaps_tpu.map.vlmap_builder import sample_pixels

    bench._enable_compile_cache()
    (step, step_whole, step_whole_ds, state, params,
     canvas_hw) = bench._build_step_and_inputs()
    if whole:  # the non-parity lseg_eval="whole" serving mode
        step = step_whole
    rng = np.random.default_rng(0)
    ch, cw = canvas_hw
    b, mp = bench.BATCH, bench.MAX_PTS
    canvas = jnp.asarray(rng.integers(0, 255, (b, ch, cw, 3)), jnp.uint8)
    z_mm = jnp.asarray((rng.uniform(0.3, 5.0, (b, mp)) * 1e3)
                       .astype(np.uint16))
    rgb = jnp.asarray(rng.integers(0, 255, (b, mp, 3)), jnp.uint8)
    pose = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (b, 1, 1)))
    idx = jnp.asarray(sample_pixels(rng, bench.H, bench.W,
                                    bench.DEPTH_SAMPLE_RATE, mp, b))
    fv = jnp.ones((b,), bool)

    def run(n):
        nonlocal state
        for _ in range(n):
            state = step(state, params, canvas, z_mm, rgb, pose, idx, fv)
        jax.block_until_ready(jax.tree.leaves(state))

    run(3)  # warm
    jax.profiler.start_trace(trace_dir)
    run(reps)
    jax.profiler.stop_trace()
    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    print(f"trace: {paths[-1]}")
    return paths[-1]


def categorize(name: str) -> str:
    if "custom-call" in name or "tpu_custom_call" in name:
        return "pallas/custom-call"
    head = name.split("=")[0]
    if "convolution" in head or "convolution" in name.split("fusion(")[0]:
        return "convolution(+fused)"
    if "1000001" in name:
        return "fusion-state (capacity rows)"
    if name.startswith("%copy"):
        return "copy/layout"
    if name.startswith("%fusion"):
        return "fusion other"
    return "other"


def summarise(xplane: str, reps: int, per_op: bool):
    from jax.profiler import ProfileData

    p = ProfileData.from_file(xplane)
    cat = collections.Counter()
    cnt = collections.Counter()
    ops = collections.Counter()
    for plane in p.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for e in line.events:
                c = categorize(e.name)
                cat[c] += e.duration_ns
                cnt[c] += 1
                key = e.name.split("=")[1].strip()[:72] \
                    if "=" in e.name else e.name[:72]
                ops[key] += e.duration_ns
    total = sum(cat.values()) / reps / 1e6
    print(f"\nTPU compute line: {total:.2f} ms/step")
    for c, ns in cat.most_common():
        print(f"  {ns / reps / 1e6:7.2f} ms  {cnt[c] // reps:4d} ev  {c}")
    if per_op:
        print("\ntop ops:")
        for k, ns in ops.most_common(24):
            print(f"  {ns / reps / 1e6:7.3f} ms  {k}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--trace-dir", default="/tmp/avlmaps_trace")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--per-op", action="store_true")
    ap.add_argument("--xplane", help="summarise an existing .xplane.pb "
                                     "instead of capturing")
    ap.add_argument("--whole", action="store_true",
                    help="trace the lseg_eval='whole' fast mode instead of "
                         "the parity sliding-window step")
    args = ap.parse_args()
    xp = args.xplane or capture(args.trace_dir, args.reps, whole=args.whole)
    summarise(xp, args.reps, args.per_op)


if __name__ == "__main__":
    main()
