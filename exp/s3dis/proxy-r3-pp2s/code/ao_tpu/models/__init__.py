from .builder import MODELS, MODULES
from .losses import LOSSES, Criteria, build_criteria
from . import default  # noqa: F401
from .point_transformer_v2 import ptv2m2  # noqa: F401
from .point_transformer import ptv1  # noqa: F401
from .sparse_unet import spunet  # noqa: F401
from .sparse_unet import mink_spvcnn  # noqa: F401
from .point_group import point_group  # noqa: F401
from .masked_scene_contrast import msc  # noqa: F401
from .context_aware_classifier import cac  # noqa: F401
from .stratified_transformer import stratified  # noqa: F401
from .octformer import octformer  # noqa: F401
from .swin3d import swin3d  # noqa: F401


def build_model(cfg):
    """Build a model from config, constructing nested ``backbone`` configs
    into module instances first (linen adopts passed-in submodules)."""
    if isinstance(cfg, dict) and isinstance(cfg.get("backbone"), dict):
        cfg = dict(cfg)
        cfg["backbone"] = build_model(cfg["backbone"])
    cfg = dict(cfg)
    cfg.pop("criteria", None)  # criteria is built separately by the engine
    return MODELS.build(cfg)
