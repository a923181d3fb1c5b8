from .msc import MaskedSceneContrast
