from .builder import LOSSES, Criteria, build_criteria
from . import misc  # noqa: F401  (registers CE/SmoothCE/Focal/Dice)
from . import lovasz  # noqa: F401  (registers LovaszLoss)
