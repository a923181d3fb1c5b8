from .spvcnn import SPVCNN, trilinear_devoxelize
