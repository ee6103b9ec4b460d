from .readers import (  # noqa: F401
    CO2_WIDE_SCHEMA,
    TABLE_NAMES,
    load_tables,
    read_co2_csv,
    read_csv,
    read_parquet,
)
from .writers import write_parquet  # noqa: F401
