"""Independent float64 NumPy/SciPy oracle implementations.

These are slow, loop-based, scalar-at-a-time re-derivations of the model
physics, deliberately structured differently from the vectorized JAX
kernels (scipy.optimize root-finding for pH, Python loops over cells),
so that agreement between the two code paths validates the math of both.
They follow the reference's test methodology of golden-output diffing
(SURVEY.md par.4) in the absence of a Fortran toolchain in this image.
"""
