"""Probe the TPU tunnel's data path: time a tiny device->host readback.

Exit 0 (healthy) when a 1 KB readback completes under --limit seconds;
exit 1 otherwise. Used by the round-5 driver loop to schedule the heavy
TPU jobs only when the relay can actually return results (measured
2026-08-21: compute dispatch 0.1 ms but 43 s for a 16 MB readback -- the
solver's chunked segments need only KB-sized readbacks, but even those
stalled >10 min during the degraded window).
"""

import sys
import time


def main():
    limit = float(sys.argv[sys.argv.index("--limit") + 1]) if "--limit" in sys.argv else 30.0
    import numpy as np
    import jax
    import jax.numpy as jnp

    d = jax.devices()[0]
    if d.platform == "cpu":
        print("cpu backend; trivially healthy")
        return 0
    x = jax.device_put(jnp.ones((256,), jnp.float32), d)
    f = jax.jit(lambda a: a * 2)
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    np.asarray(f(x)).ravel()[0]
    dt = time.perf_counter() - t0
    print(f"1KB readback: {dt*1e3:.0f} ms")
    return 0 if dt < limit else 1


if __name__ == "__main__":
    sys.exit(main())
