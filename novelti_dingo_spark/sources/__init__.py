from .io import load_table, register_views, write_parquet, read_csv, read_json

__all__ = ["load_table", "register_views", "write_parquet", "read_csv", "read_json"]
