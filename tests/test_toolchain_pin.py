"""Toolchain pin for the Mosaic/XLA perf closures (VERDICT r3 #3).

Several round-2/3 perf REJECTIONS are contingent on the toolchain, not the
design — most load-bearing: a fused Pallas refinement tail was rejected
because Mosaic's lane-shift / cross-sublane-reduce / concat lowerings
measured ~30x a vreg FMA (tools/vpu_probe.py), and int8 PTQ was closed
because this XLA stack runs int8 convs at exactly bf16 speed
(tools/int8_probe.py). Those measurements were taken under the versions
pinned below. If the toolchain moves, the closures must be re-probed before
they can keep gating design decisions — this test turns that standing
instruction (ARCHITECTURE.md "North-star status record") into an automatic
flag instead of a note someone has to remember.
"""

import jax
import jaxlib


# The versions under which every Mosaic/XLA closure measurement in
# ARCHITECTURE.md was taken (r2+r3+r4; re-verified identical at r4 start).
MOSAIC_PROBE_JAX = "0.9.0"
MOSAIC_PROBE_JAXLIB = "0.9.0"


def test_toolchain_matches_probe_versions():
    got = (jax.__version__, jaxlib.__version__)
    pinned = (MOSAIC_PROBE_JAX, MOSAIC_PROBE_JAXLIB)
    assert got == pinned, (
        f"TOOLCHAIN MOVED: jax/jaxlib {got} != {pinned} recorded with the "
        "Mosaic probe measurements. The perf closures contingent on the old "
        "toolchain must be re-validated before trusting them:\n"
        "  1. re-run tools/vpu_probe.py on the real TPU (Mosaic lane-shift/"
        "sublane-reduce costs — gates the fused-Pallas-tail rejection)\n"
        "  2. re-run tools/int8_probe.py (int8 MXU mode — gates the PTQ "
        "closure)\n"
        "  3. re-run tools/tailfold_probe.py + bench.py (per-pass HBM floor)\n"
        "then update ARCHITECTURE.md's closures and the pins in this file."
    )
