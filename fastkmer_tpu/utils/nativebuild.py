"""Shared build-on-first-import logic for the native C++ components.

Staleness is keyed on a CONTENT HASH of the source recorded in a sidecar
file next to the binary — not on mtimes: git does not preserve mtimes, so
an mtime check could accept a foreign prebuilt ``.so`` (compiled with
``-march=native`` on another machine → SIGILL/ABI risk) instead of
rebuilding.  The binaries are also excluded from version control; a library
is only ever loaded when the sidecar proves it was built from exactly the
source present on this machine.
"""

from __future__ import annotations

import hashlib
import os
import subprocess


def _src_hash(src: str) -> str:
    with open(src, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def ensure_built(src: str, so: str, extra_flags: tuple = ()) -> bool:
    """(Re)build ``so`` from ``src`` unless the sidecar hash matches the
    current source.  Returns True when a trusted binary exists."""
    tag = so + ".srchash"
    h = _src_hash(src)
    if os.path.exists(so) and os.path.exists(tag):
        try:
            with open(tag) as f:
                if f.read().strip() == h:
                    return True
        except OSError:
            pass
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", so, src,
             *extra_flags],
            check=True, capture_output=True, timeout=120,
        )
    except Exception:
        return False
    with open(tag, "w") as f:
        f.write(h)
    return True
