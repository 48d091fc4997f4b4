from .escape import flb_json_escape, unescape_string, unescape_string_utf8
from .timeparse import TimeFormat, parse_time_str, parse_time_column
from .typecast import typecast_value, cast_column

__all__ = [
    "flb_json_escape",
    "unescape_string",
    "unescape_string_utf8",
    "TimeFormat",
    "parse_time_str",
    "parse_time_column",
    "typecast_value",
    "cast_column",
]
