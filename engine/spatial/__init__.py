"""Pure numpy spatial kernels: projection, cells, Hilbert, PIP, clip, raster."""

from . import mercator, cells, hilbert, pip, clip, raster

__all__ = ["mercator", "cells", "hilbert", "pip", "clip", "raster"]
