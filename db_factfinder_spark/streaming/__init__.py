from db_factfinder_spark.streaming.events import (  # noqa: F401
    sessionize,
    stream_windowed_counts,
    windowed_counts,
)
