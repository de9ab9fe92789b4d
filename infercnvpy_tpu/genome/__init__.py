"""Genome index layer: chromosome ordering + window planning (SURVEY.md §7 L1)."""

from .plan import WindowPlan, build_window_plan, natural_sort

__all__ = ["WindowPlan", "build_window_plan", "natural_sort"]
