from mapreduce_project_spark.sources.io import (
    TABLES,
    load_table,
    load_tables,
    read_binary_files,
    read_csv,
    read_json_lines,
    read_text_lines,
    read_whole_text_files,
    write_csv,
    write_json_lines,
    write_parquet,
    write_text_lines,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_binary_files",
    "read_csv",
    "read_json_lines",
    "read_text_lines",
    "read_whole_text_files",
    "write_csv",
    "write_json_lines",
    "write_parquet",
    "write_text_lines",
]
