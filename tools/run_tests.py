#!/usr/bin/env python
"""One-command test runner: the WHOLE suite, green or non-zero exit.

Why not plain ``pytest tests/``: a single process running all ~320 tests
deterministically segfaults XLA's CPU compiler after ~160 tests —
process-state exhaustion from hundreds of large compiles, not a test bug.
This runner encodes the working split: the suite runs as several pytest
subprocesses, each bounded well below the observed limit, with the
compile-heavy Pallas/persist files isolated in their own bucket.

Usage:
    python tools/run_tests.py          # full suite
    python tools/run_tests.py -k sky   # forwards extra args to every bucket

Exit status is non-zero if ANY bucket has a failure, an error, or dies
without a parseable all-passed summary. A bucket that segfaults AFTER
printing a green summary (the known XLA teardown crash) is accepted with
a loud warning — every test in it already ran and passed.
"""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
TESTS = REPO / "tests"

# Buckets are sized so no process exceeds ~110 tests (the XLA CPU
# compiler dies at ~160 compiles/process). Keep Pallas interpret-mode
# files — the heaviest compiles — in their own bucket.
BUCKETS = {
    "unit": [
        "test_spectrum.py", "test_rng.py", "test_geometry.py",
        "test_uplift.py", "test_grid_trace.py", "test_exr.py",
        "test_native_codec.py", "test_viewer.py", "test_oracle_goldens.py",
        "test_goldens.py", "test_fuzz_scenes.py", "test_distributed.py",
    ],
    "render1": [
        "test_renderer.py", "test_cli_and_io.py", "test_dof.py",
        "test_adaptive.py", "test_texture.py",
        "test_integrator_vs_oracle.py",
    ],
    "render2": [
        "test_animation.py", "test_mesh.py", "test_denoise.py",
        "test_aov.py", "test_dispersion.py", "test_many_objects.py",
        "test_sky.py",
    ],
    "pallas": [
        "test_pallas_megakernel.py", "test_persist.py",
        "test_sharded_persist.py",
    ],
}

SUMMARY_RE = re.compile(r"(\d+) (passed|failed|error|errors)")


def run_bucket(name: str, files: list[str], extra: list[str]) -> bool:
    paths = [str(TESTS / f) for f in files]
    cmd = [sys.executable, "-m", "pytest", "-q", *paths, *extra]
    print(f"\n=== bucket {name}: {len(files)} files ===", flush=True)
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    out = proc.stdout + proc.stderr
    # echo the tail so failures are visible without rerunning
    tail = "\n".join(out.strip().splitlines()[-25:])
    print(tail, flush=True)
    counts = dict(
        (kind, int(n)) for n, kind in SUMMARY_RE.findall(out)
    )
    bad = counts.get("failed", 0) + counts.get("error", 0) + counts.get(
        "errors", 0
    )
    passed = counts.get("passed", 0)
    if proc.returncode == 0 and bad == 0 and passed > 0:
        return True
    if proc.returncode in (139, -11) and bad == 0 and passed > 0:
        print(
            f"!!! bucket {name}: green summary ({passed} passed) but the "
            "process segfaulted at teardown (known XLA CPU-compiler "
            "exhaustion). Accepting; consider shrinking this bucket.",
            flush=True,
        )
        return True
    print(f"!!! bucket {name} FAILED (exit {proc.returncode})", flush=True)
    return False


def main() -> int:
    extra = sys.argv[1:]
    known = {f for files in BUCKETS.values() for f in files}
    new = sorted(
        p.name for p in TESTS.glob("test_*.py") if p.name not in known
    )
    buckets = dict(BUCKETS)
    if new:
        print(f"note: unbucketed new test files -> extra bucket: {new}")
        buckets["new"] = new
    missing = [f for f in known if not (TESTS / f).exists()]
    if missing:
        print(f"error: bucketed files missing from tests/: {missing}")
        return 2

    results = {
        name: run_bucket(name, files, extra)
        for name, files in buckets.items()
    }
    print("\n=== results ===")
    for name, ok in results.items():
        print(f"  {name}: {'PASS' if ok else 'FAIL'}")
    return 0 if all(results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
