"""Pure-NumPy rHEALPix kernels. No Spark imports allowed in this package."""
