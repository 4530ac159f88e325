from db_factfinder_spark.functions.expr import let  # noqa: F401
from db_factfinder_spark.functions.stats import (  # noqa: F401
    OUTLIER_SENTINELS,
    agg_moe,
    convert_moe,
    get_c,
    get_p,
    get_z,
    hmoe,
    hsum,
    ratio_moe,
    round_half_even,
)
from db_factfinder_spark.functions.geoid import (  # noqa: F401
    format_geoid_2020,
    format_geotype_2020,
    make_census_geoid,
)
