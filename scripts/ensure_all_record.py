"""Round-9 record: Router.ensure_all at sf10 — fresh build manifest +
per-route scratch-vs-indexed amortization table (VERDICT r8 #5).

Drops every layout for the sf_dir, rebuilds all of them with ONE
ensure_all call, then times each route's scratch twin vs its indexed
serve. Writes docs/ENSURE_ALL_r9.json.
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


drop_all_layouts()
r = Router(spark, SF)
t0 = time.time()
manifest = r.ensure_all()
total_build = round(time.time() - t0, 2)

routes = {}
for name, route in sorted(ROUTES.items()):
    entry, how = r.resolve(name)
    assert how == "indexed", (name, how)
    indexed = min(run_once(entry) for _ in range(2))
    rec = {"indexed_entry": entry, "indexed_warm_sec": indexed}
    if route.scratch is not None:
        # 2 runs, keep the warm one (page cache + JIT)
        rec["scratch_entry"] = route.scratch
        rec["scratch_warm_sec"] = min(run_once(route.scratch) for _ in range(2))
        saving = rec["scratch_warm_sec"] - indexed
        rec["per_query_saving_sec"] = round(saving, 2)
        build = sum(
            manifest[lo]["build_sec"] for lo in route.layouts
        )
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
        "saving of the indexed plan over the scratch twin (warm, min of "
        "2 runs each, same box same run)."
    ),
}
with open(OUT, "w") as f:
    json.dump(out, f, indent=2)
print("WROTE", OUT)
print(json.dumps({k: v["build_sec"] for k, v in manifest.items()}))
