from db_factfinder_spark.streaming.events import (  # noqa: F401
    sessionize,
    stream_quota_cap,
    stream_quota_cap_aiws,
    stream_windowed_counts,
    windowed_counts,
)
