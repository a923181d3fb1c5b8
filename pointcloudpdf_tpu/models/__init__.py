from .builder import MODELS, build_model
from .losses import LOSSES, Criteria, build_criteria
from .norm import MaskedBatchNorm
from .default import DefaultSegmentor, DefaultSegmentorV2, DefaultClassifier
from . import point_transformer  # registers PT-v1 seg/cls variants
from . import sparse_unet        # registers SpUNet-v1m1/v1m2
from . import point_transformer_v3  # registers PT-v3m1
from . import point_transformer_v2  # registers PT-v2m1/v2m2
from . import stratified_transformer  # registers ST-v1m1
from . import point_group            # registers PG-v1m1
from . import context_aware_classifier  # registers CAC-v1m1
from . import masked_scene_contrast  # registers MSC-v1m1
from . import point_prompt_training  # registers PPT-v1m1
from . import oacnns                 # registers OACNNs
from . import spvcnn                 # registers SPVCNN
from . import octformer              # registers OctFormer-v1m1
from . import swin3d                 # registers Swin3D-v1m1
from .utils.structure import Points
