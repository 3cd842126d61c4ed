"""Exact-list helpers mirrored from the reference util layer.

These are the in-repo expressions of intersection / difference / title
merging (reference: ``/root/reference/libs/functions.py:17-24,120-128``).
They are O(n*m) by design (byte-parity with the reference); the
engine-scale equivalents are the anti-join in the seen-set filter and
``pyarrow.compute`` set kernels.
"""

from __future__ import annotations

__all__ = ["extract_exact", "prune_exact", "merge_titles"]


def extract_exact(list1: list, list2: list) -> list:
    """Items of list1 also present in list2, in list1 order
    (reference ``extract_exact``)."""
    return [item for item in list1 if any(other == item for other in list2)]


def prune_exact(items: list, scan_list: list) -> list:
    """Items matching nothing in scan_list, in input order
    (reference ``prune_exact``)."""
    return [item for item in items
            if not any(other == item for other in scan_list)]


def merge_titles(title1: str, title2: str) -> str:
    """Whitespace-tokenized intersection of two titles, joined by single
    spaces (reference ``merge_titles``) — keeps tokens of title1 that
    appear anywhere in title2, duplicates preserved."""
    common = extract_exact(title1.split(), title2.split())
    return " ".join(common)
