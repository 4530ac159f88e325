from db_factfinder_spark.operators.horizontal import aggregate_horizontal  # noqa: F401
from db_factfinder_spark.operators.pivot import pivot_e_m  # noqa: F401
from db_factfinder_spark.operators.cleaning import cleaning  # noqa: F401
