from .structure import Points, masked_softmax, masked_mean, masked_max
