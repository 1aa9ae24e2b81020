"""Device/host memory accounting — the structured replacement for the
reference's SizeEstimator debug calls (package.scala:769-771)."""

from __future__ import annotations


def nbytes(tree) -> int:
    """Total bytes of all array leaves in a pytree (host or device)."""
    import jax

    return sum(
        leaf.nbytes for leaf in jax.tree_util.tree_leaves(tree) if hasattr(leaf, "nbytes")
    )


def human(n: int) -> str:
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if n < 1024:
            return f"{n:.1f}{unit}"
        n /= 1024
    return f"{n:.1f}PB"
