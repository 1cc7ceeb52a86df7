from .backend import (
    Backend,
    HybridBackend,
    JaxF64Backend,
    JaxIntervalBackend,
    NumpyF64Backend,
    NumpyIntervalBackend,
    ObjectBackend,
)
from .tensorpoly import INF_DEGREE, TaylorPoly

__all__ = [
    "Backend",
    "HybridBackend",
    "JaxF64Backend",
    "JaxIntervalBackend",
    "NumpyF64Backend",
    "NumpyIntervalBackend",
    "ObjectBackend",
    "TaylorPoly",
    "INF_DEGREE",
]
