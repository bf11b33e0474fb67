from .builder import DATASETS, build_dataset
from .transform import TRANSFORMS, Compose
from .collate import collate_fn, point_collate_fn
from .loader import DataLoader, ShardedSampler
from .defaults import DefaultDataset, ConcatDataset, load_scene
from . import s3dis  # noqa: F401
from . import scannet  # noqa: F401
from . import modelnet  # noqa: F401
from . import semantic_kitti  # noqa: F401
from . import synthetic  # noqa: F401
from . import nuscenes  # noqa: F401
from . import misc_datasets  # noqa: F401
