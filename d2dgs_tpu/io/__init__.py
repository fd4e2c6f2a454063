from .ply import load_gaussian_ply, save_gaussian_ply
from .checkpoint import load_train_state, save_train_state

__all__ = ["load_gaussian_ply", "save_gaussian_ply",
           "load_train_state", "save_train_state"]
