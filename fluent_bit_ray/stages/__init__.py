from .base import Filter, FilterChain, record_columns
from .enrich import HostEnricher
from .grep import GrepFilter
from .modify import ModifyFilter
from .nest import NestFilter
from .parser_filter import ParserFilter
from .record_modifier import RecordModifierFilter
from .throttle import StdoutFilter, ThrottleFilter, UdfFilter

__all__ = [
    "Filter",
    "FilterChain",
    "record_columns",
    "HostEnricher",
    "GrepFilter",
    "ModifyFilter",
    "NestFilter",
    "ParserFilter",
    "RecordModifierFilter",
    "StdoutFilter",
    "ThrottleFilter",
    "UdfFilter",
]
