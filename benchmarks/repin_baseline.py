"""Re-pin bench_baseline.json same-method (VERDICT r4 next #5).

r1-r3 flagship numbers were taken at 16 transitions/call and carry the
per-call tunnel dispatch tax (~54 ms/call) in every transition;
``bench.py`` now times 64-transition blocks.  To make ``vs_baseline``
compare same-method over same-method, this re-measures the ROUND-3 kernel
configuration (whole-tree kernel, block_c=512, no padded IO / no in-kernel
RNG — BENCH_r03.json + benchmarks/flagship_opt_ab.json "classic" bc=512 arm)
under the current 64-transition-block timing and pins the result.

Run on the TPU:  python benchmarks/repin_baseline.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

R3_TREE_OPTS = {"block_c": 512}  # classic arm: no padded_io, no refresh_inside


def main():
    rate, steps, dt, eff, used = bench.bench_leapfrog_steps_per_sec(
        tree_opts=R3_TREE_OPTS)
    out = {
        "comment": (
            "round-3 kernel configuration (whole-tree kernel, block_c=512, "
            "classic IO — BENCH_r03/flagship_opt_ab 'classic' arm) "
            "re-measured under the CURRENT bench.py method (64-transition "
            "blocks, best-of-3, production sampling path) so vs_baseline is "
            "same-method over same-method; the old 22.0M pin was taken at "
            "16 transitions/call and carried ~3.4 ms/transition of tunnel "
            "dispatch tax (docs/DESIGN.md #10). run-to-run tunnel variance "
            "~±5%"),
        "leapfrog_steps_per_sec_10k_chains": round(rate, 1),
        "method": "64-transition blocks, best-of-3, production path",
        "leapfrog_steps": steps,
        "leapfrog_wall_s": round(dt, 3),
        "leapfrog_config": used,
    }
    if eff is not None:
        out["leaf_work_over_wall"] = round(eff, 3)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
