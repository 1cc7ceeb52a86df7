from .backend import Backend, JaxF64Backend, JaxIntervalBackend, ObjectBackend
from .tensorpoly import INF_DEGREE, TaylorPoly

__all__ = [
    "Backend",
    "JaxF64Backend",
    "JaxIntervalBackend",
    "ObjectBackend",
    "TaylorPoly",
    "INF_DEGREE",
]
