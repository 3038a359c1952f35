"""Quantify host-RSS growth per host->device transfer (environment probe).

Long training runs through this environment's tunneled accelerator client
grow host RSS by roughly one uploaded batch per step (see NOTES.md round-3
environment findings) until the OOM killer fires. This probe isolates the
effect: device_put + tiny jitted reduce in a loop, with a hard sync every
`sync` iterations, printing RSS deltas. Run it against the real chip
(PYTHONPATH=.:/root/.axon_site) when the device is otherwise idle; on the
CPU backend the leak does not reproduce (repo code is not the source).

Run: PYTHONPATH=.:/root/.axon_site python tools/leak_probe.py [mb] [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def rss_gb() -> float:
    import os

    with open("/proc/self/statm") as f:
        pages = int(f.read().split()[1])
    return pages * os.sysconf("SC_PAGE_SIZE") / 1e9


def main():
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    n = int(mb * 1e6)
    x = np.random.default_rng(0).integers(0, 255, (n,), np.uint8)

    @jax.jit
    def f(a):
        return jnp.sum(a.astype(jnp.float32))

    out = f(jax.device_put(x))
    float(out)
    base = rss_gb()
    print(f"devices={jax.devices()} payload={mb} MB base_rss={base:.2f} GB")
    t0 = time.time()
    for i in range(iters):
        out = f(jax.device_put(x))
        if (i + 1) % 50 == 0:
            float(out)  # hard sync: value materialized on host
            grown = rss_gb() - base
            print(
                f"iter {i + 1:4d}  rss +{grown:.3f} GB "
                f"({grown * 1e3 / (i + 1):.2f} MB/iter, "
                f"{(time.time() - t0) / (i + 1) * 1e3:.1f} ms/iter)",
                flush=True,
            )


if __name__ == "__main__":
    main()
