from .metrics import msssim, evaluate_image_metrics
from .render_sets import render_test_set

__all__ = ["msssim", "evaluate_image_metrics", "render_test_set"]
