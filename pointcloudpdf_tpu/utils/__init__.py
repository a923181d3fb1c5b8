from .registry import Registry, build_from_cfg
from .config import Config, ConfigDict, DictAction, merge_dict
from .logger import get_logger, get_root_logger
from .events import EventStorage, AverageMeter, HistoryBuffer, get_event_storage
from .env import set_seed, get_random_seed
from .misc import (
    intersection_and_union,
    intersection_and_union_np,
    average_precision,
    roc_auc,
    aupr_and_auroc,
    selected_mask,
    make_dirs,
)
