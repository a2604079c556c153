#!/usr/bin/env python
"""Run the oracle-parity comparison for a slice of the registry.

Usage: python scripts/parity_sweep.py <sf_dir> [start] [end]
Prints one line per query; exits nonzero if any mismatch.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from stream_processor_spark.queries import REGISTRY  # noqa: E402
from stream_processor_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import compare  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    end = int(sys.argv[3]) if len(sys.argv) > 3 else 10**9

    spark = get_spark("parity-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    names = sorted(n for n, s in REGISTRY.items() if s.oracle)[start:end]
    failures = 0
    for name in names:
        spec = REGISTRY[name]
        t0 = time.perf_counter()
        try:
            res = compare(name, spec.fn(spark, sf_dir), spec.oracle, sf_dir)
            ok, detail = res.ok, res.detail
        except Exception as e:  # noqa: BLE001
            ok, detail = False, f"{type(e).__name__}: {str(e)[:160]}"
        dt = time.perf_counter() - t0
        status = "OK  " if ok else "FAIL"
        print(f"{status} {name:32s} {dt:6.2f}s  {'' if ok else detail}", flush=True)
        failures += 0 if ok else 1
    print(f"done: {len(names) - failures}/{len(names)} ok", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
