"""Sphinx configuration for pyprob_tpu's readthedocs-style docs
(reference counterpart: pyprob docs/source/conf.py)."""

import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "pyprob_tpu"
author = "pyprob_tpu developers"
copyright = "2026, pyprob_tpu developers"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "myst_parser",  # markdown docs (architecture.md) in the same tree
]
autosummary_generate = True
autodoc_member_order = "bysource"
# jax / zmq may be absent or heavy on doc builders
autodoc_mock_imports = ["jax", "jaxlib", "optax", "zmq"]

source_suffix = {".rst": "restructuredtext", ".md": "markdown"}
master_doc = "index"
# The executed walkthrough notebook ships as a viewable artifact
# (examples/make_notebooks.py keeps it in sync with examples/); it is
# excluded from the strict -W build so rendering needs no nbsphinx.
exclude_patterns = ["*.ipynb"]

try:  # readthedocs theme where installed; stock theme otherwise
    import sphinx_rtd_theme  # noqa: F401

    html_theme = "sphinx_rtd_theme"
except ImportError:
    html_theme = "alabaster"
