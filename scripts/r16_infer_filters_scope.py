#!/usr/bin/env python
"""Round-16 (r15 verdict item 6): scope the engine-wide
InferFiltersFromGenerate exclusion (session.py).

For EVERY registry entry whose physical plan contains a Generate node,
build the plan twice in one session — with the exclusion (the engine
default) and with the rule re-enabled (`spark.sql.optimizer.excludedRules`
is a runtime conf) — and record, per entry:

  - parquet PushedFilters sets under each setting (did any entry LOSE a
    useful scan filter to the exclusion?),
  - Filter / Generate / Exchange node counts under each setting,
  - whether the plans differ at all.

The rule is results-neutral by construction (it only ADDS inferred
row-trim predicates below a Generate); the question the record answers
is whether the exclusion costs any OTHER generator entry a useful scan
filter, or whether its only effect is removing the re-computed-array
scan predicates the text family measured as 10x at sf10 (session.py).

Usage: python scripts/r16_infer_filters_scope.py [sf_dir] > docs/INFER_FILTERS_SCOPE_r16.json
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RULE = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"


def pushed_filters(plan: str) -> list[str]:
    return sorted(
        m.strip()
        for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        if m.strip()
    )


def shape(plan: str) -> dict:
    return {
        "filters": len(re.findall(r"\bFilter\b", plan)),
        "generates": len(re.findall(r"\bGenerate\b", plan)),
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "pushed": pushed_filters(plan),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from stream_processor_spark.queries import REGISTRY
    from stream_processor_spark.session import get_spark

    spark = get_spark("r16-infer-filters-scope")
    spark.sparkContext.setLogLevel("ERROR")

    def plan_of(name: str) -> str:
        df = REGISTRY[name].fn(spark, sf_dir)
        return spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    out: dict = {"rule": RULE, "sf_dir": sf_dir, "entries": {}}
    gen_entries: list[str] = []
    for name in sorted(REGISTRY):
        try:
            p = plan_of(name)
        except Exception as exc:  # entries needing absent env stay out
            out["entries"][name] = {"err": str(exc)[:200]}
            continue
        if "Generate" in p:
            gen_entries.append(name)
            out["entries"][name] = {"excluded": shape(p)}
        print(f"scan {name}: generate={'Generate' in p}", file=sys.stderr, flush=True)

    # second pass with the rule re-enabled, generator entries only
    spark.conf.set("spark.sql.optimizer.excludedRules", "")
    for name in gen_entries:
        try:
            p = plan_of(name)
        except Exception as exc:
            out["entries"][name]["enabled_err"] = str(exc)[:200]
            continue
        ent = out["entries"][name]
        ent["enabled"] = shape(p)
        ent["pushed_lost_by_exclusion"] = sorted(
            set(ent["enabled"]["pushed"]) - set(ent["excluded"]["pushed"])
        )
        print(f"diff {name}: lost={ent['pushed_lost_by_exclusion']}",
              file=sys.stderr, flush=True)
    spark.conf.set("spark.sql.optimizer.excludedRules", RULE)

    out["n_generator_entries"] = len(gen_entries)
    out["entries_losing_pushed_filters"] = sorted(
        n
        for n in gen_entries
        if out["entries"][n].get("pushed_lost_by_exclusion")
    )
    json.dump(out, sys.stdout, indent=1)
    print()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
