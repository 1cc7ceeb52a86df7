from .pallas_conv import conv1d_pallas

__all__ = ["conv1d_pallas"]
