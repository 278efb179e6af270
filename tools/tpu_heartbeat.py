#!/usr/bin/env python
"""Keep the remote-TPU backend session warm with a tiny dispatch every ~30 s.

Why this exists: the FIRST jit dispatch of a fresh process over the axon
tunnel pays a backend warmup that has been measured at anywhere from seconds
to 8+ minutes when the remote session has gone cold (round 5 probes; it is
the most likely cause of round 4's benchless rc=124 — the driver's bench
process spent its entire timeout inside that first dispatch).  A resident
heartbeat keeps the server session established so any new client (the
driver's `bench.py`, a training segment, a profiling tool) starts fast.

The heartbeat's duty cycle is negligible — one 8-float elementwise op every
30 s (microseconds of device time); it never contends with real work.  It
intentionally does NOT register under /tmp/sup_*.pid: `tools/pause_runs.sh`
and `tools/winddown.sh` must leave it running, because its whole purpose is
to stay alive through benchmark windows and round boundaries.

Usage:
    setsid nohup python tools/tpu_heartbeat.py >/tmp/tpu_heartbeat.log 2>&1 &
    echo $! > /tmp/tpu_heartbeat.pid
Stop with: kill $(cat /tmp/tpu_heartbeat.pid)
"""

import os
import sys
import time

INTERVAL_S = float(os.environ.get("FLOWMOL_HEARTBEAT_S", 30))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    fn = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(8)
    t0 = time.time()
    x = fn(x)
    np.asarray(x)
    print(f"{time.strftime('%H:%M:%S')} warmup {time.time() - t0:.1f}s",
          flush=True)
    beats = 0
    while True:
        time.sleep(INTERVAL_S)
        t0 = time.time()
        x = fn(x)
        np.asarray(x)
        dt = time.time() - t0
        beats += 1
        # log sparsely unless a beat is slow (slow beat = session went cold
        # or the chip is saturated by real work — both worth a timestamp)
        if dt > 1.0 or beats % 20 == 0:
            print(f"{time.strftime('%H:%M:%S')} beat {beats} {dt:.2f}s",
                  flush=True)


if __name__ == "__main__":
    try:
        main()
    except KeyboardInterrupt:
        sys.exit(0)
