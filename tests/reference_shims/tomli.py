"""tomli stand-in: re-export the stdlib tomllib (Python >= 3.11)."""

from tomllib import *  # noqa: F401,F403
from tomllib import load, loads  # noqa: F401
