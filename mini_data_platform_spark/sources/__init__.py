from mini_data_platform_spark.sources.formats import detect_format, sniff_json_layout
from mini_data_platform_spark.sources.readers import read_file, read_file_as_strings
from mini_data_platform_spark.sources.validate import validate_file

__all__ = [
    "detect_format",
    "sniff_json_layout",
    "read_file",
    "read_file_as_strings",
    "validate_file",
]
