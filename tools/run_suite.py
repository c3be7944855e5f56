#!/usr/bin/env python3
"""Run the test suite with per-module process isolation.

The full (slow-tier) suite takes ~70 min in one process and the XLA CPU
compiler segfaults nondeterministically once a process accumulates many
hundreds of compilations (see tests/conftest.py). One pytest process per
test module bounds the blast radius: a compiler crash loses one module,
not the whole run, and modules can be spread over N parallel workers on
multi-core machines.

    python tools/run_suite.py                # full suite, 1 worker
    python tools/run_suite.py --quick        # -m "not slow"
    python tools/run_suite.py --jobs 4       # 4 modules in flight
    python tools/run_suite.py -k pattern     # forwarded to pytest

Exit code 0 iff every module passed (pytest exit 5 = no tests collected
in this profile — counted as a pass).
"""

import argparse
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help='run the quick profile (-m "not slow")')
    p.add_argument("--jobs", type=int, default=1,
                   help="modules to run concurrently")
    p.add_argument("-k", default="", help="pytest -k expression")
    p.add_argument("--timeout", type=float, default=3600.0,
                   help="per-module hard timeout (s)")
    args = p.parse_args()

    tests_dir = os.path.join(REPO, "tests")
    modules = sorted(f for f in os.listdir(tests_dir)
                     if f.startswith("test_") and f.endswith(".py"))

    base = [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider"]
    if args.quick:
        base += ["-m", "not slow"]
    if args.k:
        base += ["-k", args.k]

    def run_module(mod):
        t0 = time.time()
        try:
            r = subprocess.run(
                base + [os.path.join("tests", mod)], cwd=REPO,
                capture_output=True, text=True, timeout=args.timeout)
            rc, out = r.returncode, (r.stdout or "") + (r.stderr or "")
        except subprocess.TimeoutExpired:
            rc, out = -1, f"TIMEOUT after {args.timeout:.0f}s"
        ok = rc in (0, 5)  # 5 = nothing collected under this profile
        tail = out.strip().splitlines()[-1] if out.strip() else ""
        print(f"{'PASS' if ok else 'FAIL'} {mod:40s} "
              f"{time.time() - t0:7.1f}s  {tail[:90]}", flush=True)
        if not ok:
            print(out[-4000:], flush=True)
        return ok

    t0 = time.time()
    if args.jobs > 1:
        with ThreadPoolExecutor(max_workers=args.jobs) as ex:
            results = list(ex.map(run_module, modules))
    else:
        results = [run_module(m) for m in modules]
    n_fail = results.count(False)
    print(f"\n{len(modules) - n_fail}/{len(modules)} modules passed "
          f"in {(time.time() - t0) / 60:.1f} min")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
