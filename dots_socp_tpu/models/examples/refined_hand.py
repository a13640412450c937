"""Refined hand: same densities as hand on the refined mesh."""
from dots_socp_tpu.models.examples.hand import get_mu  # noqa: F401
