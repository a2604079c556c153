#!/usr/bin/env python
"""Run the oracle-parity comparison for a slice of the registry.

Usage: python scripts/parity_sweep.py <sf_dir> [start] [end]
       python scripts/parity_sweep.py <sf_dir> --names a,b,c
       python scripts/parity_sweep.py <sf_dir> --json docs/PARITY_rN.json
Prints one line per query; exits nonzero if any mismatch. --names runs
exactly the listed queries (so post-sweep additions can be verified at
every scale without re-running the whole registry — round-6 verdict
item 3); unknown or oracle-less names fail loudly. --json additionally
writes a machine-readable per-entry record in the driver's
CORRECTNESS_r{N}.json shape ({rows_match, schema_match, hash_match,
err} per name — round-12 verdict item 4: the full-registry sweep
becomes independently auditable at a glance, not a text log).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from stream_processor_spark.queries import REGISTRY  # noqa: E402
from stream_processor_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import compare  # noqa: E402


def main() -> int:
    argv = list(sys.argv[1:])
    wanted: list[str] | None = None
    json_path: str | None = None
    if "--names" in argv:
        i = argv.index("--names")
        wanted = [n for n in argv[i + 1].split(",") if n]
        del argv[i : i + 2]
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    start = int(argv[1]) if len(argv) > 1 else 0
    end = int(argv[2]) if len(argv) > 2 else 10**9

    spark = get_spark("parity-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    if wanted is not None:
        unknown = [n for n in wanted if n not in REGISTRY]
        no_oracle = [
            n for n in wanted if n in REGISTRY and not REGISTRY[n].oracle
        ]
        if unknown or no_oracle:
            print(f"unknown: {unknown}; no oracle: {no_oracle}")
            return 2
        names = wanted
    else:
        names = sorted(n for n, s in REGISTRY.items() if s.oracle)[start:end]
    failures = 0
    records: dict[str, dict] = {}
    for name in names:
        spec = REGISTRY[name]
        t0 = time.perf_counter()
        err = None
        try:
            res = compare(name, spec.fn(spark, sf_dir), spec.oracle, sf_dir)
            ok, detail = res.ok, res.detail
        except Exception as e:  # noqa: BLE001
            ok, detail = False, f"{type(e).__name__}: {str(e)[:160]}"
            err = detail
        dt = time.perf_counter() - t0
        # compare() short-circuits: row count, then columns, then values
        # — map the failing stage onto the driver's correctness shape
        rows_ok = ok or not detail.startswith("row count:")
        schema_ok = ok or (rows_ok and not detail.startswith("columns:"))
        records[name] = {
            "rows_match": bool(ok or (err is None and rows_ok)),
            "schema_match": bool(ok or (err is None and rows_ok and schema_ok)),
            "hash_match": bool(ok),
            "err": err if err is not None else (None if ok else detail[:300]),
            "sec": round(dt, 2),
        }
        status = "OK  " if ok else "FAIL"
        print(f"{status} {name:32s} {dt:6.2f}s  {'' if ok else detail}", flush=True)
        failures += 0 if ok else 1
    print(f"done: {len(names) - failures}/{len(names)} ok", flush=True)
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n": len(names),
                    "n_ok": len(names) - failures,
                    "entries": records,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {json_path}", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
