"""Shim for legacy installers (metadata lives in pyproject.toml).

Kept so `pip install -e .` works on environments whose setuptools
predates PEP 660 editable wheels, and so `python setup.py develop`
remains available in hermetic sandboxes without the `wheel` package
(see scripts/build_wheel.py for hermetic wheel builds there).
"""

from setuptools import setup

setup()
