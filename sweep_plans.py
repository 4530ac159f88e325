"""Plan-shape sweep over every bench headline entry: operator /
Exchange / join / scan counts plus anti-pattern flags (Python eval
nodes, cartesian products) from explain("formatted") at sf0.1.

The r12 per-operator checklist evidence (same sweep r11 ran): plan
shape is the noise-free signal on this host.
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry
from bench import HEADLINE
from db_factfinder_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="sweep_plans_r12")
    qs = entry.queries()
    out = {}
    for name in HEADLINE:
        try:
            df = qs[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": str(exc)[:200]}
            continue
        out[name] = {
            "ops": len(re.findall(r"^\(\d+\)", txt, re.M)),
            "exchange": txt.count("Exchange"),
            "smj": txt.count("SortMergeJoin"),
            "bhj": txt.count("BroadcastHashJoin"),
            "cartesian": txt.count("CartesianProduct"),
            "bnlj": txt.count("BroadcastNestedLoopJoin"),
            "pyeval": txt.count("BatchEvalPython")
            + txt.count("ArrowEvalPython"),
            "mapinpandas": txt.count("MapInPandas") + txt.count("MapInArrow"),
            "parquet": txt.count("Scan parquet"),
            "rdd": txt.count("Scan ExistingRDD"),
            "chars": len(txt),
        }
        print(name, json.dumps(out[name]), flush=True)
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "plans", "r12", "sweep_summary.json"),
        "w",
    ) as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
