from .io import (
    ensure_session_confs,
    load_table,
    register_views,
    write_parquet,
    read_csv,
    read_json,
    read_orc,
    write_orc,
)

__all__ = [
    "ensure_session_confs",
    "load_table",
    "register_views",
    "write_parquet",
    "read_csv",
    "read_json",
    "read_orc",
    "write_orc",
]
