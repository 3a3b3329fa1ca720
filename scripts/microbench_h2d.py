"""H2D upload chunking/overlap sweep through the remote-TPU tunnel.

The D2H direction measured a 3x win for 32 overlapping chunk streams over
one large fetch (utils/transfer.py). This sweeps the H2D direction: a
fixed total payload uploaded as K back-to-back jnp.asarray dispatches
(async, one thread -- the axon backend rejects multi-threaded device
access), with the clock stopped at a scalar fetch depending on every
chunk. A "sync-each" variant quantifies how much overlap the back-to-back
dispatch actually buys.

Run on the real TPU: PYTHONPATH=. python scripts/microbench_h2d.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

TOTAL = 256 << 20  # bytes uploaded per measurement


def force(chunks):
    acc = chunks[0].ravel()[0].astype(jnp.float32)
    for c in chunks[1:]:
        acc = acc + c.ravel()[0].astype(jnp.float32)
    return float(np.asarray(acc))


def main():
    rng = np.random.default_rng(0)
    for k in (1, 4, 8, 16, 32):
        part = rng.integers(0, 65535, size=(TOTAL // k) // 2,
                            dtype=np.uint16)
        parts = [part + np.uint16(i) for i in range(k)]
        for sync_each in (False, True):
            if k == 1 and sync_each:
                continue
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                if sync_each:
                    chunks = []
                    for p in parts:
                        c = jnp.asarray(p)
                        c.block_until_ready()
                        chunks.append(c)
                else:
                    chunks = [jnp.asarray(p) for p in parts]
                force(chunks)
                best = min(best, time.perf_counter() - t0)
                del chunks
            mode = "sync-each" if sync_each else "back-to-back"
            print(f"k={k:3d} x {TOTAL // k >> 20:3d}MB  {mode:12s}: "
                  f"{best:6.2f} s  ({TOTAL / best / 2**20:7.1f} MB/s)",
                  flush=True)


if __name__ == "__main__":
    main()
