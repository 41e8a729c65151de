from udacity_data_engineering_spark.streaming.event_stream import (  # noqa: F401
    deduped_events,
    sessionized_counts,
    stream_events,
    run_available_now,
    windowed_counts,
)
from udacity_data_engineering_spark.streaming.joins import (  # noqa: F401
    purchases_after_signup,
    signups_with_conversion,
)
from udacity_data_engineering_spark.streaming.stateful import (  # noqa: F401
    running_user_totals,
    write_stream_parquet,
)
