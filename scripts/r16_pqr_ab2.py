#!/usr/bin/env python
"""ABBA-interleaved A/B for the round-16 sim_ann_pq_residual re-plan,
with per-run host-load samples and per-run Spark job/stage counts (an
objective, load-independent plan-size signal).

A = round-15 registry shape (inline replica, scripts/r16_pqr_ab.py's
build_r15). B = current registry shape. Alternates AB / BA per round so
a monotonic outside-load ramp cannot bias one side.

Usage: python scripts/r16_pqr_ab2.py [n_rounds] [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from r16_pqr_ab import build_r15  # noqa: E402


def loadavg() -> float:
    with open("/proc/loadavg") as fh:
        return float(fh.read().split()[0])


def main() -> int:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import stream_processor_spark.queries.llm_data as ld
    from stream_processor_spark.catalog import Tables
    from stream_processor_spark.session import get_spark

    spark = get_spark("r16-pqr-ab2")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    t = Tables(spark, sf_dir)

    a = [tuple(r) for r in build_r15(t).collect()]
    ld._pqr_drop_previous()
    b = [tuple(r) for r in ld._pq_residual_frame(t).collect()]
    print(f"identity: {a == b} n={len(a)}", flush=True)
    assert a == b
    ld._pqr_drop_previous()

    shapes = {
        "r15": lambda: build_r15(t),
        "r16": lambda: ld._pq_residual_frame(t),
    }
    tot: dict[str, list[float]] = {n: [] for n in shapes}
    jobs: dict[str, list[int]] = {n: [] for n in shapes}
    for rnd in range(n_rounds):
        order = ["r15", "r16"] if rnd % 2 == 0 else ["r16", "r15"]
        for name in order:
            build = shapes[name]
            grp = f"pqr16-{name}-{rnd}"
            sc.setJobGroup(grp, name)
            la0 = loadavg()
            t0 = time.perf_counter()
            df = build()
            df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            nj = len(sc.statusTracker().getJobIdsForGroup(grp))
            sc.setJobGroup(None, None)
            tot[name].append(dt)
            jobs[name].append(nj)
            print(
                f"round{rnd} {name}: total={dt:.3f} jobs={nj} "
                f"load_at_start={la0:.1f} load_after={loadavg():.1f}",
                flush=True,
            )
            ld._pqr_drop_previous()
    for name in shapes:
        ts = sorted(tot[name])
        print(
            f"{name}: best={ts[0]:.3f} med={ts[len(ts) // 2]:.3f} "
            f"jobs={jobs[name][0]} all={[round(x, 3) for x in ts]}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
