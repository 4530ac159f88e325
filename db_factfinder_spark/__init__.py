"""db_factfinder_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of NYCPlanning/db-factfinder.

The reference (at /root/reference) is an eager, single-node pandas ETL
engine.  This package re-expresses its entire operator surface —
horizontal/vertical aggregation, margin-of-error statistics, interpolated
grouped medians, special-variable formulas, geography crosswalks, the
cleaning rule cascade — as *lazy, distributed* Spark SQL / DataFrame
plans over Parquet, plus the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing)
that a 100 TB deployment needs.

Design principles
-----------------
* DataFrame/SQL first: every operator is a composition of built-in
  ``pyspark.sql.functions`` column expressions so Catalyst can push
  filters, prune columns and keep everything inside whole-stage codegen.
* No row-at-a-time Python UDFs anywhere in the hot path.  The reference's
  ``df.apply(axis=1)`` statistics (utils.py:24-48, median.py:43-197,
  special.py:21-142) are all native ``when``/``sqrt``/``aggregate``
  expressions here.
* Dimension tables (geography lookups, crosswalk ratios) are broadcast;
  fact aggregations shuffle once on their group key.
* NULL is the engine's missing value; the reference's ``np.nan``
  semantics (skipna sums, NaN→0 MOE aggregation) are encoded explicitly
  where they differ from SQL NULL propagation.
"""

__version__ = "0.1.0"

from db_factfinder_spark.session import get_spark  # noqa: F401
