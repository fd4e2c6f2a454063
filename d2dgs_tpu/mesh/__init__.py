from .tsdf import TsdfVolume, integrate_view, extract_mesh, largest_components
from .extract import reconstruct_mesh

__all__ = ["TsdfVolume", "integrate_view", "extract_mesh",
           "largest_components", "reconstruct_mesh"]
