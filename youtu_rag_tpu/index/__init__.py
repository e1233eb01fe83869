from .metadata import MetadataSchema, MISSING_I32
from .filters import CompiledFilter, compile_filter, FilterError
from .device_index import DeviceVectorIndex
from .numpy_ref import NumpyVectorIndex

__all__ = [
    "CompiledFilter",
    "DeviceVectorIndex",
    "FilterError",
    "MISSING_I32",
    "MetadataSchema",
    "NumpyVectorIndex",
    "compile_filter",
]
