"""Scoped-VMEM budgeting for the Pallas sweep kernels.

Mosaic's default scoped-VMEM cap (16 MB) rejects supercell-sized kernels even
though the hardware (v5e: 128 MB) fits them comfortably: the per-frame rate
matrix alone is N^2 * 4 bytes and the grid pipeline double-buffers streamed
inputs. Each kernel sums its true footprint with (sublane, lane) tile padding
and passes ``limit_bytes`` as ``CompilerParams.vmem_limit_bytes``.
"""

from __future__ import annotations

_LANE = 128
_SUBLANE = 8


def padded_bytes(*shape: int, itemsize: int = 4) -> int:
    """Bytes a buffer occupies in VMEM: trailing two dims round up to the
    (8, 128) register tile, leading dims multiply."""
    if not shape:
        return itemsize
    lane = -(-shape[-1] // _LANE) * _LANE
    sub = -(-shape[-2] // _SUBLANE) * _SUBLANE if len(shape) >= 2 else 1
    lead = 1
    for d in shape[:-2]:
        lead *= d
    return itemsize * lead * sub * lane


def limit_bytes(total: int, headroom: float = 1.5, cap: int = 110 << 20) -> int:
    """Compiler VMEM cap from an estimated buffer footprint. The estimate
    deliberately skips Mosaic's own temporaries (matmul accumulators, DMA
    staging), so apply 50% headroom + 12 MB slack; never drop below the 16 MB
    default (the estimate is a floor, not an exact count) and stay under
    110 MB to leave room for the runtime's reservations (measured: the top-K
    kernel at N=4608/TR=128 needs a 103.7 MB stack and runs fine under this
    cap on v5e; 100 MB rejected it at compile time)."""
    return min(max(int(total * headroom) + (12 << 20), 16 << 20), cap)
