"""Column-level API: pandas UDFs over the NumPy kernels plus pure
column expressions for everything string/arithmetic."""

from .udfs import (  # noqa: F401
    cell_area_col,
    cell_width_col,
    rhp_base_cell,
    rhp_boundary,
    rhp_center_child,
    rhp_centroid,
    rhp_encode,
    rhp_intersects_meridian,
    rhp_intersects_parallel,
    rhp_is_valid_col,
    rhp_k_ring,
    rhp_level_order_index,
    rhp_neighbors,
    rhp_nucleus,
    rhp_parent,
    rhp_resolution,
)
