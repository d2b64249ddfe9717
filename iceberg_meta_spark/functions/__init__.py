from iceberg_meta_spark.functions.display import (
    compact_number,
    format_bytes,
    format_net,
    format_timestamp_us,
    truncate_path,
)
