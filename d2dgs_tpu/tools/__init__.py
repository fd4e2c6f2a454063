"""Offline data-preparation tools (reference convert.py,
data_tools/colmap2nerf.py, data_tools/phone_catch.py).

These drive external binaries (colmap, ffmpeg) via subprocess and fail
with actionable errors when a binary is missing; nothing here touches
the TPU compute path.
"""
