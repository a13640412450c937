"""Refined punctured ball: same densities on the refined mesh."""
from dots_socp_tpu.models.examples.punctured_ball import get_mu  # noqa: F401
