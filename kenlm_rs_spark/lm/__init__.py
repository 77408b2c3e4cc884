from .model import NGramModel, State
from .arpa import ArpaError, read_arpa
from .headers import FixedParameters, read_headers

__all__ = [
    "NGramModel",
    "State",
    "ArpaError",
    "read_arpa",
    "FixedParameters",
    "read_headers",
]
