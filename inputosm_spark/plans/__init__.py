"""Thin planner layer: partitioning/layout policies + plan inspection.

SURVEY.md §4: no custom Catalyst rules are needed — the planner is
plain Python choosing DataFrame rewrites (broadcast vs shuffle,
salting, bucket counts) from data statistics.
"""
