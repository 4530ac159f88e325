"""Spill-safety evidence (VERDICT r4 ask #6): the two largest-shuffle
exact operators (q111 AllPairs similarity join, q130 ExactSubstr span
removal) must return IDENTICAL results when executor memory is starved
enough to force sort/aggregate spill-to-disk paths.

Everything in both operators is exact-integer / exact-string keyed, so
spilling may only change WHERE partial states live, never their merge
result — this pins that property against a real tight-memory JVM
rather than trusting it.  A separate subprocess is required because
executor memory and ``spark.memory.fraction`` are frozen at JVM launch
(the session-scoped test fixture can't be re-configured in-process).
"""

import json
import os
import subprocess
import sys

import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.1")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NAMES = [
    "q111_prefix_filter_pairs",
    "q130_span_removal",
    # round-5 additions: the rank-window + decimal-sum Gini and the
    # union-window + remainder-split attribution — their per-group
    # sorts and window buffers are exactly what a starved executor
    # spills first
    "q189_gini_concentration",
    "q194_linear_attribution",
    # late round-6: the medoid's within-group pair join + argmin
    # window and FIFO's cumulative windows + keyed overlap join are
    # the new largest sort buffers
    "q272_fifo_cogs",
    "q277_group_medoids",
    # round-8 additions: the U-shaped split (per-conversion windows +
    # integer remainder credits) and the Markov chain (per-user
    # journey windows + the transition groupBy) are integer-exact end
    # to end — spill may move partials, never change the merge
    "q358_position_attribution",
    "q359_markov_attribution",
]

_CHILD = r"""
import json, sys
sys.path.insert(0, %(root)r)
import __spark_entry__ as E
from db_factfinder_spark.session import get_spark
spark = get_spark(
    app_name="spill-child",
    cpus=4,
    extra_conf={
        # starve execution memory so big sorts/aggs must spill; results
        # must not care
        "spark.memory.fraction": "0.1",
        "spark.shuffle.spill.numElementsForceSpillThreshold": "5000",
    },
)
out = {}
for name in %(names)r:
    rows = E.queries()[name](spark, %(sf)r).collect()
    out[name] = sorted(map(str, rows))
print("SPILLRESULT:" + json.dumps(out))
"""


@pytest.mark.slow
def test_q111_q130_identical_under_memory_starvation(spark):
    expected = {
        name: sorted(map(str, entry_mod.queries()[name](spark, SF_DIR).collect()))
        for name in NAMES
    }
    env = dict(os.environ, SPARK_DRIVER_MEMORY="1g")
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD % {"root": ROOT, "names": NAMES, "sf": SF_DIR}],
        capture_output=True, text=True, timeout=560, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("SPILLRESULT:")]
    assert line, proc.stdout[-2000:]
    got = json.loads(line[-1][len("SPILLRESULT:"):])
    for name in NAMES:
        assert got[name] == expected[name], (
            f"{name}: tight-memory run diverged "
            f"({len(got[name])} vs {len(expected[name])} rows)"
        )
