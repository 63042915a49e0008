"""Shim for legacy installs; configuration lives in pyproject.toml."""

from setuptools import setup

setup()
