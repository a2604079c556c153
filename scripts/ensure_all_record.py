"""Round-9 record: Router.ensure_all at sf10 — fresh build manifest +
per-route scratch-vs-indexed amortization table (VERDICT r8 #5).

Drops every layout for the sf_dir, rebuilds all of them with ONE
ensure_all call, then times each route's indexed serve (min of 2) and
its scratch twin (once — the teaching twins are measured elsewhere and
several are known 10+ min at sf10; SKIP_SCRATCH entries cite the
existing same-scale records instead of re-burning an hour here).
Writes docs/ENSURE_ALL_r9.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stream_processor_spark.session import get_spark
from stream_processor_spark.router import LAYOUTS, ROUTES, Router
from stream_processor_spark.queries.base import REGISTRY
import stream_processor_spark.queries  # noqa: F401  (registry population)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf10"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/docs/ENSURE_ALL_r9.json"

# scratch twins too expensive to re-measure inside this record at sf10;
# each has its own committed record/analysis at scale
SKIP_SCRATCH = {
    "dedup_near": "scratch LSH pipeline over raw scan splits; sf0.1 record "
    "docs/DUCKDB_COMPARE_r8 (3.41 s vs 0.76 s indexed)",
    "dedup_semantic": "scratch trainer in the request path; sf0.1 record "
    "docs/SEMANTIC_INDEX_r8.json (3.13 s scratch / 1.14 s indexed)",
    "text_bm25": "teaching twin, documented 10.6-13x at sf0.1 "
    "(docs/DUCKDB_COMPARE_r8_run*)",
}


def log(msg):
    print(f"### {msg}", flush=True)


spark = get_spark()


def drop_all_layouts():
    from stream_processor_spark.operators.storage import drop_warehouse_dir

    for layout, (names_fn, _) in LAYOUTS.items():
        for n in names_fn(spark, SF):
            spark.sql(f"DROP TABLE IF EXISTS {n}")
            drop_warehouse_dir(spark, n)


def run_once(entry):
    t0 = time.time()
    REGISTRY[entry].fn(spark, SF).write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


log("dropping all layouts")
drop_all_layouts()
r = Router(spark, SF)
log("ensure_all starting")


# instrument the build order by wrapping each layout's builder
_orig = {k: v for k, v in LAYOUTS.items()}
for k, (names_fn, build) in list(LAYOUTS.items()):
    def make(k=k, build=build):
        def wrapped(s, d):
            log(f"building {k}")
            build(s, d)
            log(f"built {k}")
        return wrapped
    LAYOUTS[k] = (names_fn, make())

t0 = time.time()
manifest = r.ensure_all()
total_build = round(time.time() - t0, 2)
LAYOUTS.update(_orig)
log(f"ensure_all done in {total_build}s")

routes = {}
for name, route in sorted(ROUTES.items()):
    entry, how = r.resolve(name)
    assert how == "indexed", (name, how)
    log(f"route {name}: indexed={entry}")
    indexed = min(run_once(entry) for _ in range(2))
    rec = {"indexed_entry": entry, "indexed_warm_sec": indexed}
    if route.scratch is not None:
        rec["scratch_entry"] = route.scratch
        if route.scratch in SKIP_SCRATCH:
            rec["scratch_skipped"] = SKIP_SCRATCH[route.scratch]
        else:
            log(f"route {name}: scratch={route.scratch}")
            rec["scratch_warm_sec"] = run_once(route.scratch)
            saving = rec["scratch_warm_sec"] - indexed
            rec["per_query_saving_sec"] = round(saving, 2)
            build = sum(manifest[lo]["build_sec"] for lo in route.layouts)
            rec["layout_build_sec"] = round(build, 2)
            rec["queries_to_amortize"] = (
                round(build / saving, 1) if saving > 0 else None
            )
    routes[name] = rec

out = {
    "sf_dir": SF,
    "date": "2026-08-15",
    "ensure_all_total_build_sec": total_build,
    "build_manifest": manifest,
    "routes": routes,
    "note": (
        "One Router.ensure_all() call builds every layout from a clean "
        "catalog; per-route amortization = layout build cost / per-query "
        "saving of the indexed plan over the scratch twin (indexed min of "
        "2 warm runs; scratch one run — cold-ish upper bound on saving is "
        "conservative in the indexed plan's favor only if scratch is warm, "
        "so treat queries_to_amortize as approximate). Three scratch twins "
        "are referenced from their committed records instead of re-measured "
        "(scratch_skipped)."
    ),
}
with open(OUT, "w") as f:
    json.dump(out, f, indent=2)
log("WROTE " + OUT)
print(json.dumps({k: v["build_sec"] for k, v in manifest.items()}))
