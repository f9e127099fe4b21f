"""Roofline accounting for the recurrence kernels (SURVEY §5: 'roofline
check for the Pallas kernel').

The fused batch-1 kernel is VMEM-bandwidth-bound on per-step weight
streaming (measured: compacting weight rows bought 1.69×, FLOPs are ~0.1%
of MXU peak at these shapes). This module computes the per-step streamed
bytes and MACs for a model in the kernel's actual padded layout and
reports the bandwidth-implied latency floor next to a measured time.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

V5E_VMEM_GBPS = 1700.0   # effective VMEM streaming bandwidth observed
V5E_MXU_MACS = 1.0e14 / 2  # ~100 TFLOP/s f32 → 50 T MAC/s

LANE = 128
SUB = 8


def _tiles(rows: int, cols: int) -> int:
    return -(-rows // SUB) * -(-cols // LANE)


@dataclasses.dataclass
class StepCost:
    bytes_streamed: int
    macs: int

    def bandwidth_floor_us(self) -> float:
        return self.bytes_streamed / (V5E_VMEM_GBPS * 1e3)

    def compute_floor_us(self) -> float:
        return self.macs / (V5E_MXU_MACS * 1e-6)


def dense_step_cost(input_dim: int, units: Sequence[int]) -> StepCost:
    """Per-step streamed bytes / MACs of the fused dense kernel in its
    row-compact, gate-aligned layout."""
    tiles = 0
    macs = 0
    d = input_dim
    for n in units:
        npg = -(-n // LANE) * LANE
        tiles += _tiles(d, 4 * npg)  # W
        tiles += _tiles(n, 4 * npg)  # U
        macs += d * 4 * n + n * 4 * n
        d = n
    return StepCost(bytes_streamed=tiles * SUB * LANE * 4, macs=macs)


def reduced_step_cost(
    input_dim: int, units: Sequence[int], ranks: Sequence[int], merged: bool = True
) -> StepCost:
    """Per-step cost of the folded two-step kernel ((v@B)@[I|C] per side)."""
    tiles = 0
    macs = 0
    d = input_dim
    for n, r in zip(units, ranks):
        npg = -(-n // LANE) * LANE
        rp = -(-r // LANE) * LANE
        if merged:
            for rows in (d, n):  # input side then recurrent side
                tiles += _tiles(rows, rp)        # B
                tiles += _tiles(r, 4 * npg)      # [I|C]
                macs += rows * r + r * 4 * n
        else:
            for rows in (d, n):
                tiles += 4 * (_tiles(rows, rp) + _tiles(r, npg))
                macs += 4 * (rows * r + r * n)
        d = n
    return StepCost(bytes_streamed=tiles * SUB * LANE * 4, macs=macs)


def report(cost: StepCost, measured_us_per_step: float | None = None) -> str:
    lines = [
        f"streamed/step: {cost.bytes_streamed/1024:.1f} KiB  "
        f"-> bandwidth floor {cost.bandwidth_floor_us()*1e3:.1f} ns/step",
        f"MACs/step: {cost.macs}  -> compute floor {cost.compute_floor_us()*1e3:.3f} ns/step",
    ]
    if measured_us_per_step is not None:
        lines.append(
            f"measured: {measured_us_per_step*1e3:.1f} ns/step "
            f"({cost.bandwidth_floor_us()/measured_us_per_step*100:.0f}% of bandwidth roofline)"
        )
    return "\n".join(lines)
