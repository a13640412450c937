"""Minimal numexpr stand-in (test + benchmark tooling only).

Lets the reference implementation at /root/reference run in this environment
(numexpr is not installed and cannot be) so our solver can be validated and
fairly benchmarked against its trajectories. Evaluates expressions with
numpy in the caller's namespace; supports the `out=` and `local_dict=`
arguments the reference uses.

Threading: `set_num_threads(n)` is honored the way numexpr honors it -- when
n > 1, elementwise expressions are evaluated in n chunks along the leading
axis on a thread pool (numpy releases the GIL inside its ufunc inner loops,
so the chunks genuinely run in parallel). Chunking only engages when every
array operand shares the same leading-axis length; anything else falls back
to one whole-array numpy eval. This mirrors numexpr's blocked multi-threaded
VM closely enough for a fair CPU baseline; numexpr's remaining edge (fused
single-pass evaluation without numpy temporaries) is noted in BASELINE.md.
"""

import sys
from concurrent.futures import ThreadPoolExecutor

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

_NTHREADS = 1
_POOL = None


def set_num_threads(n):
    global _NTHREADS, _POOL
    n = max(1, int(n))
    if n != _NTHREADS:
        if _POOL is not None:
            _POOL.shutdown(wait=False)
        _NTHREADS = n
        _POOL = ThreadPoolExecutor(max_workers=n) if n > 1 else None
    return n


def detect_number_of_cores():
    import os

    return os.cpu_count() or 1


def _eval_whole(code, namespace, out):
    result = eval(code, {}, namespace)  # noqa: S307 - test shim
    if out is not None:
        out[...] = result
        return out
    return np.asarray(result)


def evaluate(expr, out=None, local_dict=None, **kwargs):
    if local_dict is None:
        frame = sys._getframe(1)
        namespace = {**frame.f_globals, **frame.f_locals}
    else:
        namespace = dict(local_dict)
    # Vectorized functions must win over scalar ones (e.g. the caller's
    # module-level `from math import sqrt`).
    namespace.update(_FUNCS)
    code = compile(expr, "<numexpr-shim>", "eval")

    if _POOL is None:
        return _eval_whole(code, namespace, out)

    # Chunk along the leading axis when all array operands agree on it.
    names = [n for n in code.co_names if n in namespace]
    array_names = [
        n
        for n in names
        if isinstance(namespace[n], np.ndarray) and namespace[n].ndim >= 1
    ]
    leads = {namespace[n].shape[0] for n in array_names}
    if len(leads) != 1:
        return _eval_whole(code, namespace, out)
    length = leads.pop()
    if length < 2 * _NTHREADS:
        return _eval_whole(code, namespace, out)

    bounds = np.linspace(0, length, _NTHREADS + 1, dtype=int)

    def chunk_eval(lo, hi):
        local = dict(namespace)
        for n in array_names:
            local[n] = namespace[n][lo:hi]
        result = eval(code, {}, local)  # noqa: S307 - test shim
        if out is not None:
            out[lo:hi] = result
            return None
        return np.asarray(result)

    futures = [
        _POOL.submit(chunk_eval, bounds[i], bounds[i + 1])
        for i in range(_NTHREADS)
    ]
    parts = [f.result() for f in futures]
    if out is not None:
        return out
    return np.concatenate(parts, axis=0)
