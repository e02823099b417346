"""Shared scale-tuning knobs for the iterative kernels.

``BROADCAST_MAX_ROWS``: above this many rows a per-superstep vector is never
FORCE-broadcast — the plan falls back to a shuffle join (AQE may still
broadcast from runtime stats). A driver-built broadcast of an O(V)-row
vector is the serial fraction that caps N->4N scaling (plans/grid.py); one
shared constant makes the invariant grep-auditable: every ``F.broadcast`` of
an iteration vector in this package is gated on a known row count against
this limit (or the kernel runs in ``mode='grid'`` and broadcasts nothing).
"""

from __future__ import annotations

#: 4M rows of (long, double) ~ 64 MB serialized — comfortably under
#: executor/driver headroom at 1000 executors, far under it locally.
#: Kernels gate inline (`bb = ... and n <= BROADCAST_MAX_ROWS`) because the
#: same flag also parameterizes operator arguments, not just F.broadcast.
BROADCAST_MAX_ROWS = 4_000_000
