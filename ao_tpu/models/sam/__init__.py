from .modeling import SamConfig, SamModel
from .convert import (
    convert_hf_state_dict,
    convert_original_checkpoint,
    load_sam_checkpoint,
)
from .oracle import OracleSamPredictor
from .predictor import SamPredictor
