from .msgpack_io import (  # noqa: F401
    ExtType,
    decode_event_time,
    forward_file_dataset,
    iter_forward_frames,
    msgpack_pack,
    msgpack_unpack,
    pack_event_time,
)
