"""Scalar function pack (SURVEY.md §2.7) — Catalyst Column expressions."""

from datalake_toolkit_spark.functions.scalar import (
    ddb_json_to_plain_map,
    escape_special_chars,
    fill_none_with_empty_array,
    fill_none_with_empty_string,
    millis_str_to_seconds,
    normalize_s3_uri,
    parse_date,
    partition_name,
    plain_map_to_ddb_json,
    sanitize_csv_header,
    skewed_str_to_values,
    skewed_values_to_str,
    string_list_str_to_array,
    unix_seconds_to_gson,
    with_prefix,
)

__all__ = [
    "ddb_json_to_plain_map",
    "escape_special_chars",
    "fill_none_with_empty_array",
    "fill_none_with_empty_string",
    "millis_str_to_seconds",
    "normalize_s3_uri",
    "parse_date",
    "partition_name",
    "plain_map_to_ddb_json",
    "sanitize_csv_header",
    "skewed_str_to_values",
    "skewed_values_to_str",
    "string_list_str_to_array",
    "unix_seconds_to_gson",
    "with_prefix",
]
