from .builder import MODELS, build_model
from .losses import LOSSES, Criteria, build_criteria
from .norm import MaskedBatchNorm
from .default import DefaultSegmentor, DefaultSegmentorV2, DefaultClassifier
from . import point_transformer  # registers PT-v1 seg/cls variants
from . import sparse_unet        # registers SpUNet-v1m1/v1m2
from .utils.structure import Points
