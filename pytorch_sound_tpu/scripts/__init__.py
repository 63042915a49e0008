"""Operator CLIs: dataset preprocessing and checkpoint conversion tools."""
