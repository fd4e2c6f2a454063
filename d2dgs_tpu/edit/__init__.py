from .arap import ArapGraph, arap_deform, build_graph, deform_energy
from .keypoints import DeformKeypoints
from .lap_deform import LapDeform

__all__ = ["ArapGraph", "arap_deform", "build_graph", "deform_energy",
           "DeformKeypoints", "LapDeform"]
