"""Refined armadillo: same densities as armadillo on the refined mesh."""
from dots_socp_tpu.models.examples.armadillo import get_mu  # noqa: F401
