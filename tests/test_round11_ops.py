"""Round-11 additions: ADVICE fixes (adamic_adar one-shot flag
independence) plus the cross-geography / outer-mode change tables and
crosswalk-revision incremental maintenance added this round."""

import logging
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).parent.parent))

SF = "/root/testdata/sf0.001"


def test_adamic_adar_cap_log_independent_of_dedup_flag(spark, caplog):
    """adamic_adar's one-time CAPPED-plan marker must have its OWN
    flag: a process that already ran a capped dedup (dedup._CAP_LOGGED
    set) must still see the adamic_adar lower-bound message once."""
    from db_factfinder_spark.llmdata import components as C
    from db_factfinder_spark.llmdata import dedup as D

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src int, dst int")
    old_aa, old_dd = C._AA_CAP_LOGGED, D._CAP_LOGGED
    try:
        D._CAP_LOGGED = True  # dedup logged first in this process
        C._AA_CAP_LOGGED = False
        with caplog.at_level(
            logging.INFO, logger="db_factfinder_spark.llmdata.components"
        ):
            C.adamic_adar(edges)  # plan-time log, no action needed
        assert any(
            "adamic_adar" in r.getMessage() and "LOWER BOUND" in r.getMessage()
            for r in caplog.records
        )
        assert C._AA_CAP_LOGGED is True
        assert D._CAP_LOGGED is True  # dedup's flag untouched
        # and the marker stays one-shot
        caplog.clear()
        with caplog.at_level(
            logging.INFO, logger="db_factfinder_spark.llmdata.components"
        ):
            C.adamic_adar(edges)
        assert not any(
            "adamic_adar" in r.getMessage() for r in caplog.records
        )
    finally:
        C._AA_CAP_LOGGED, D._CAP_LOGGED = old_aa, old_dd
