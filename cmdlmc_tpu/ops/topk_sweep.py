"""Fused Pallas sweep kernel over K-nearest neighbor lists (placeholder —
real kernel lands next)."""

from __future__ import annotations


def topk_unsupported_reason(model) -> str | None:
    return "top-K fused kernel not yet available"


def run_block_topk(*args, **kwargs):
    raise NotImplementedError
