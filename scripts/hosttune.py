"""Sandbox host tuning for reproducible benchmarks (bench scripts only).

This sandbox VM ships a DAMON kdamond in ``paddr`` mode with a
``pageout`` scheme (DAMON-based proactive reclaim: sample every 5 ms,
aggregate every 500 ms over all physical memory). Under multi-GB Spark
workloads its rmap scans + page-out attempts burn tens of CPU-minutes of
kernel time (measured: 43 min sys for a 95 s-of-work job) and serialize
memory management, inverting core scaling:

  4x concurrent local[8] pipeline runs, 3M-turn shards each
    DAMON on : walls 227-260 s, user 32.5 min, sys 42.9 min
    DAMON off: walls  64-75 s, user 11.9 min, sys  2.4 min

On a production cluster this is standard node tuning (no distro enables
DAMON reclaim by default). Benchmarks call :func:`tune` — it disables
the daemon if the sysfs knob is writable and logs what it did; it is a
no-op anywhere else. Restore manually with
``echo on > /sys/kernel/mm/damon/admin/kdamonds/0/state``.
"""

from __future__ import annotations

import glob
import sys

_STATE_GLOB = "/sys/kernel/mm/damon/admin/kdamonds/*/state"


def tune(verbose: bool = True) -> bool:
    """Disable DAMON proactive reclaim if present. Returns True if any
    kdamond was turned off."""
    changed = False
    for path in glob.glob(_STATE_GLOB):
        try:
            with open(path) as f:
                state = f.read().strip()
            if state == "on":
                with open(path, "w") as f:
                    f.write("off")
                changed = True
                if verbose:
                    print(f"[hosttune] disabled DAMON kdamond at {path}", file=sys.stderr)
        except OSError:
            pass
    return changed


if __name__ == "__main__":
    tune()
