from powerdatapipeline_spark.functions.datetime_funcs import (  # noqa: F401
    concat_date_time,
    cyclical_day,
    cyclical_hour,
    cyclical_minute,
    cyclical_minute_hour_day,
    epoch_seconds,
    seconds_to_days_minutes_seconds,
    synthetic_datetime,
    with_derived_columns,
)
from powerdatapipeline_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
    vectorize,
)
