"""Global settings (figure saving, dataset cache, verbosity).

The reference delegates these to ``scanpy.settings`` (reference:
datasets/__init__.py:39, pl/_chromosome_heatmap.py:90); this framework is
standalone, so it carries its own small settings module.
"""

from __future__ import annotations

import os
from pathlib import Path

#: Directory where `save=` plots are written.
figdir = Path("./figures/")

#: Directory where downloaded / generated datasets are cached.
datasetdir = Path(os.environ.get("INFERCNVPY_TPU_DATA", "~/.cache/infercnvpy_tpu")).expanduser()

#: Whether plotting functions show figures by default.
autoshow = True

#: Default floating dtype for TPU compute ("float32" or "float64").
compute_dtype = "float32"

#: Verbosity: 0=errors, 1=warnings, 2=info, 3=debug
verbosity = 1
