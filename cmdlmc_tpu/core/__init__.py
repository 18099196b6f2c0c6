from cmdlmc_tpu.core.cell import (
    Cell,
    angle,
    displacement,
    distance,
    extended_positions,
    minimum_image,
    next_neighbor,
    pairwise_distances,
)

__all__ = [
    "Cell",
    "angle",
    "displacement",
    "distance",
    "extended_positions",
    "minimum_image",
    "next_neighbor",
    "pairwise_distances",
]
