from .core import (
    DEFAULT_REGISTRY,
    NAT,
    Parser,
    ParserRegistry,
)
from .decoders import DecoderRule, apply_decoders, apply_decoders_columns

__all__ = [
    "DEFAULT_REGISTRY",
    "NAT",
    "Parser",
    "ParserRegistry",
    "DecoderRule",
    "apply_decoders",
    "apply_decoders_columns",
]
