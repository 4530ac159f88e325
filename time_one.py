"""Time one headline query in a fresh session: build + two warm
passes (plan rebuilt per pass, noop sink) — the bench's warm
methodology for one entry.  Usage: python time_one.py qname [reps]"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry
from db_factfinder_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark(app_name=f"time_one_{name}")
    q = entry.queries()[name]
    # absorb session startup on a trivial scan
    spark.read.parquet(f"{SF_DIR}/region.parquet").selectExpr(
        "count(*)"
    ).write.format("noop").mode("overwrite").save()
    best = None
    for r in range(reps):
        t0 = time.perf_counter()
        df = q(spark, SF_DIR)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        print(f"{name} rep{r}: build {t1-t0:.2f} total {dt:.2f}", flush=True)
    print(f"{name} best {best:.2f}")


if __name__ == "__main__":
    main()
