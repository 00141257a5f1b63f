"""Pure scalar / vectorized kernels. No Ray imports here."""
