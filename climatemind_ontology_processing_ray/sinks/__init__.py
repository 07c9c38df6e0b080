from .partitioned import (
    lookup_key,
    read_key_range,
    write_range_partitioned,
)

__all__ = ["write_range_partitioned", "read_key_range", "lookup_key"]
