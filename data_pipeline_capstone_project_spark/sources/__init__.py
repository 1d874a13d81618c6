from .readers import (  # noqa: F401
    load_table,
    load_tables,
    read_csv,
    read_json_lake,
    read_binary_store,
)
