from db_factfinder_spark.plans.planner import FactFinderEngine, ParquetWideSource  # noqa: F401
