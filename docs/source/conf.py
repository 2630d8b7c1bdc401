# Sphinx configuration for tnax (mirrors reference doc/source/conf.py).
import os
import sys
sys.path.insert(0, os.path.abspath("../.."))

project = "tnax"
author = "tnax developers"
extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
]
autodoc_member_order = "bysource"
html_theme = "alabaster"
