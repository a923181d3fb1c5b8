from .builder import HOOKS, build_hooks
from .default import HookBase
from .misc import (
    IterationTimer,
    InformationWriter,
    CheckpointSaver,
    CheckpointLoader,
    OpenSegCheckpointSaver,
    OpenSegCheckpointLoader,
    IncrSegCheckpointSaver,
    IncrSegCheckpointLoader,
)
from .evaluator import (
    SemSegEvaluator,
    ClsEvaluator,
    OpenSegEvaluator,
    IncrSegEvaluator,
    InsSegEvaluator,
)
