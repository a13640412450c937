"""Minimal numexpr stand-in (test tooling only).

Lets the reference implementation at /root/reference run in this environment
so our solver can be validated against its trajectories. Evaluates
expressions with numpy in the caller's namespace; supports the `out=` and
`local_dict=` arguments the reference uses.
"""

import sys

import numpy as np

# pandas probes optional accelerators by version; report one so its
# import_optional_dependency check doesn't fail when this shim is loaded.
__version__ = "2.11.0"

_FUNCS = {
    "sqrt": np.sqrt,
    "abs": np.abs,
    "exp": np.exp,
    "log": np.log,
    "where": np.where,
    "maximum": np.maximum,
    "minimum": np.minimum,
}


def evaluate(expr, out=None, local_dict=None, **kwargs):
    if local_dict is None:
        frame = sys._getframe(1)
        namespace = {**frame.f_globals, **frame.f_locals}
    else:
        namespace = dict(local_dict)
    # Vectorized functions must win over scalar ones (e.g. the caller's
    # module-level `from math import sqrt`).
    namespace.update(_FUNCS)
    result = eval(expr, {}, namespace)  # noqa: S307 - test shim
    if out is not None:
        out[...] = result
        return out
    return np.asarray(result)


def set_num_threads(n):
    return n


def detect_number_of_cores():
    import os

    return os.cpu_count() or 1
