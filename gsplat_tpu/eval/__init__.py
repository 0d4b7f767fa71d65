"""Offline rendering and metrics (render.py / metrics.py / full_eval.py)."""
