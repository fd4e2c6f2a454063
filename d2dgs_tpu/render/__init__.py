from .renderer import render  # noqa: F401
