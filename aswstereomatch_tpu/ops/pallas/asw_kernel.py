"""Fused Pallas TPU kernel for cost + ASW aggregation (placeholder).

Filled in by the kernel milestone (SURVEY.md section 7, PR3): one kernel per
(y, x) tile that computes the raw cost on the fly from VMEM-resident image
tiles, applies Yoon-Kweon weights with the left planes cached across d, and
aggregates per-disparity slabs without materializing H*W*D in HBM.
"""

from __future__ import annotations

from ...config import StereoConfig


def supports(cfg: StereoConfig) -> bool:
    """Whether the fused kernel covers this config on this platform."""
    return False


def aggregated_volume(left, right, cfg: StereoConfig):  # pragma: no cover
    raise NotImplementedError("pallas ASW kernel lands in the PR3 milestone")
