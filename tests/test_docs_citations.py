"""Docs-cite-it => repo-contains-it (VERDICT r3 next #5).

Two rounds in a row shipped design notes citing measurement JSONs that were
never committed (r2: the ablation; r3: flagship_opt_ab / logistic_mxu_sweep /
asis_ab).  An uncommitted measurement is an unverifiable claim, so this test
makes the discipline mechanical: every ``benchmarks/*.json`` path referenced
anywhere in ``docs/*.md``, ``README.md``, the package sources, the benchmark
harness docstrings, or the tests must exist in the tree.
"""

import glob
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PAT = re.compile(r"benchmarks/[A-Za-z0-9_\-]+\.json")


def _scan_files():
    files = (glob.glob(os.path.join(REPO, "docs", "*.md"))
             + glob.glob(os.path.join(REPO, "*.md"))
             + glob.glob(os.path.join(REPO, "benchmarks", "*.py"))
             + glob.glob(os.path.join(REPO, "inplacedhmc_tpu", "**", "*.py"),
                         recursive=True)
             + glob.glob(os.path.join(REPO, "tests", "*.py"))
             + [os.path.join(REPO, "bench.py")])
    # verdict/advice are the judge's artifacts, not the repo's claims
    skip = {"VERDICT.md", "ADVICE.md"}
    return [f for f in files if os.path.basename(f) not in skip]


def test_cited_benchmark_jsons_exist():
    missing = {}
    for path in _scan_files():
        with open(path, encoding="utf-8") as f:
            text = f.read()
        for ref in set(_PAT.findall(text)):
            if not os.path.exists(os.path.join(REPO, ref)):
                missing.setdefault(ref, []).append(os.path.relpath(path, REPO))
    assert not missing, (
        "benchmark result JSONs cited but not in the tree (run the harness "
        f"and commit its output): {missing}")
