from .knn import knn, knn_query
from .knn_spatial import knn_self_spatial, knn_cross_spatial, morton_code
from .grouping import grouping, grouping_with_rel_coord
from .grid_pool import grid_pool, unpool_map
from .interpolation import interpolation
from .sampling import farthest_point_sampling
from .ball_query import ball_query, random_ball_query
