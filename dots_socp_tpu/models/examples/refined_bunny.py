"""Refined bunny: same densities as bunny on the refined mesh."""
from dots_socp_tpu.models.examples.bunny import get_mu  # noqa: F401
