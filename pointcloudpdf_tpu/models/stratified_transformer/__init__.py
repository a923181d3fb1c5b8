from .st import StratifiedTransformer
