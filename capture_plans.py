"""Capture .explain("formatted") for named queries into plans/r12/.

Usage: python capture_plans.py before|after q337_... q366_... ...
Plan-shape evidence is the noise-free signal on this steal-stormy host
(OPTIMIZATION_r11.md "Measurement environment").
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry
from db_factfinder_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r12")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name=f"plans_r12_{tag}")
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        n_ex = len(re.findall(r"Exchange", txt))
        n_smj = len(re.findall(r"SortMergeJoin", txt))
        n_ops = len(re.findall(r"^\(\d+\)", txt, re.M))
        n_rdd = len(re.findall(r"Scan ExistingRDD", txt))
        n_pq = len(re.findall(r"Scan parquet", txt))
        print(
            f"{name} [{tag}]: ops={n_ops} Exchange={n_ex} SMJ={n_smj} "
            f"ExistingRDD={n_rdd} parquet={n_pq} chars={len(txt)}"
        )


if __name__ == "__main__":
    main()
