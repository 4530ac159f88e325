from db_factfinder_spark.sources.readers import (  # noqa: F401
    packaged_profile_mapping_path,
    packaged_ratio_path,
    read_lookup_geo,
    read_ratio,
    read_wide,
    scrub_wide,
)
from db_factfinder_spark.sources.cache import CheckpointCache  # noqa: F401
