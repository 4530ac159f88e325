"""Ad-hoc single-query strict check: ``python check_one.py qname [sf_dir]``.
Reuses correctness_full's comparator so a PASS here means a PASS there."""

import os
import sys
import time

if len(sys.argv) > 2:
    os.environ["FULL_SF_DIR"] = sys.argv[2]
os.environ.setdefault("FULL_STRICT", "1")

import correctness_full as cf  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402
from db_factfinder_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    spark = get_spark(app_name="check_one")
    t0 = time.time()
    sdf = entry_mod.queries()[name](spark, cf.SF_DIR).toPandas()
    t1 = time.time()
    oracles = entry_mod.oracle_sql()
    if name not in oracles:
        print(f"{name}: rows-only, {len(sdf)} rows ({t1-t0:.1f}s)")
        return
    odf = cf._duck(oracles[name])
    t2 = time.time()
    rows = len(sdf) == len(odf)
    schema = sorted(sdf.columns) == sorted(odf.columns)
    print(f"rows {len(sdf)} vs {len(odf)}: {rows}; schema: {schema} "
          f"(spark {t1-t0:.1f}s, duck {t2-t1:.1f}s)")
    if not schema:
        print("spark cols:", sorted(sdf.columns))
        print("duck  cols:", sorted(odf.columns))
        return
    if not rows:
        return
    s, o = cf._normalize(sdf), cf._normalize(odf)
    bad = 0
    for col in s.columns:
        for i, (a, b) in enumerate(zip(s[col].tolist(), o[col].tolist())):
            if not cf._values_equal(a, b):
                if bad < 10:
                    print(f"  MISMATCH {col}[{i}]: spark={a!r} oracle={b!r}")
                    print("   spark row:", s.iloc[i].to_dict())
                    print("   duck  row:", o.iloc[i].to_dict())
                bad += 1
    print(f"{name}: {'PASS' if bad == 0 else f'FAIL ({bad} mismatches)'}")


if __name__ == "__main__":
    main()
