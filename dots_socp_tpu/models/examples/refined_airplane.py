"""Refined airplane: same densities as airplane on the refined mesh."""
from dots_socp_tpu.models.examples.airplane import get_mu  # noqa: F401
