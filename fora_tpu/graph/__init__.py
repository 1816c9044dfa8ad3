from .csr import CSRGraph, DeviceGraph, from_edges, to_device
from .alias import AliasTables, build_alias
from . import generators, io

__all__ = [
    "CSRGraph", "DeviceGraph", "from_edges", "to_device",
    "AliasTables", "build_alias",
    "generators", "io",
]
