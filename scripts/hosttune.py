"""Sandbox host tuning for reproducible benchmarks (explicit opt-in).

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
DAMON reclaim by default). Because it mutates host-wide kernel state,
:func:`tune` is a no-op unless ``VXS_HOSTTUNE=1`` is exported (the scale
bench scripts document this); when it does flip a knob it prints
prominently and registers an ``atexit`` hook restoring the prior state.
"""

from __future__ import annotations

import atexit
import glob
import os
import sys

_STATE_GLOB = "/sys/kernel/mm/damon/admin/kdamonds/*/state"
_restore: dict[str, str] = {}


def _restore_all() -> None:
    for path, prior in _restore.items():
        try:
            with open(path, "w") as f:
                f.write(prior)
            print(f"[hosttune] restored DAMON kdamond at {path} -> {prior}", file=sys.stderr)
        except OSError:
            print(f"[hosttune] WARNING: could not restore {path} to {prior}", file=sys.stderr)


def tune(verbose: bool = True, enable: bool | None = None) -> bool:
    """Disable DAMON proactive reclaim if present and opted-in.

    Opt-in is ``enable=True`` (benchmark entrypoints whose docs declare
    the host mutation) or ``VXS_HOSTTUNE=1`` in the environment. Returns
    True if any kdamond was turned off. The prior state is restored at
    interpreter exit.
    """
    if enable is None:
        enable = os.environ.get("VXS_HOSTTUNE") == "1"
    if not enable:
        if verbose and glob.glob(_STATE_GLOB):
            print(
                "[hosttune] DAMON kdamond present but VXS_HOSTTUNE!=1; "
                "leaving host state untouched (export VXS_HOSTTUNE=1 to opt in)",
                file=sys.stderr,
            )
        return False
    changed = False
    for path in glob.glob(_STATE_GLOB):
        try:
            with open(path) as f:
                state = f.read().strip()
            if state == "on":
                with open(path, "w") as f:
                    f.write("off")
                changed = True
                if path not in _restore:
                    _restore[path] = state
                print(
                    f"[hosttune] *** HOST STATE CHANGED: disabled DAMON kdamond at {path} "
                    "(will restore on exit) ***",
                    file=sys.stderr,
                )
        except OSError:
            pass
    if changed:
        atexit.register(_restore_all)
    return changed


if __name__ == "__main__":
    tune()
