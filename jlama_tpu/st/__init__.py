from .format import DTYPES, TensorInfo, parse_header, serialize_header
from .reader import SafeTensorFile, SafeTensorIndex
from .writer import SafeTensorWriter

__all__ = [
    "DTYPES",
    "TensorInfo",
    "parse_header",
    "serialize_header",
    "SafeTensorFile",
    "SafeTensorIndex",
    "SafeTensorWriter",
]
