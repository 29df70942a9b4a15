"""Host memory tuning for plan-build-heavy workloads.

The symbolic/plan phase allocates GBs of short-lived numpy temporaries.
On virtualized hosts (Firecracker microVMs and similar), transparent
hugepages make every first touch a synchronous 2 MB folio zeroing
(`folio_zero_user` via `__do_huge_pmd_anonymous_page`) that runs at
~150 MB/s — a measured 3.5 GB plan build spent 14-27 s in the kernel.
Disabling THP for the process switches to 4 KB faults and cut the
R-MAT-14 SpGEMM plan build from ~22-36 s to ~11 s on the bench VM.

Opt out with ``NSPARSE_THP=keep`` (bare-metal hosts with fast folio
zeroing may prefer hugepages for TLB reach).
"""

from __future__ import annotations

import ctypes
import os

_PR_SET_THP_DISABLE = 41
_done = False


def tune_host_memory() -> bool:
    """Disable transparent hugepages for this process (idempotent).

    Returns True when the prctl succeeded (or already ran), False when
    opted out or unsupported.  Safe to call from library entry points:
    affects only page granularity of future anonymous mappings.
    """
    global _done
    if _done:
        return True
    if os.environ.get("NSPARSE_THP", "").lower() == "keep":
        return False
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        if libc.prctl(_PR_SET_THP_DISABLE, 1, 0, 0, 0) == 0:
            _done = True
    except OSError:
        return False
    return _done
