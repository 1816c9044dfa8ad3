from .csr import CSRGraph, DeviceGraph, ELLGraph, from_edges, to_device, pack_ell, ell_padding_waste
from .alias import AliasTables, build_alias
from . import generators, io

__all__ = [
    "CSRGraph", "DeviceGraph", "ELLGraph", "from_edges", "to_device",
    "pack_ell", "ell_padding_waste", "AliasTables", "build_alias",
    "generators", "io",
]
