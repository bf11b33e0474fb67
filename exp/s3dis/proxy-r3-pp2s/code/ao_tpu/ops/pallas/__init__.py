from .knn_window import knn_window_pallas
from .merge_topk import merge_topk_dedup
