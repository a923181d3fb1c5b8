from .octformer import octformer_v1m1
