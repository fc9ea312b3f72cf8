from datafusion_delta_sharing_spark.sources.schema import (
    schema_from_string,
    decode_partition_value,
    decode_partition_values,
)
from datafusion_delta_sharing_spark.sources.reader import DeltaSharingReader

__all__ = [
    "schema_from_string",
    "decode_partition_value",
    "decode_partition_values",
    "DeltaSharingReader",
]
