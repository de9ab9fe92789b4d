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


def enable_compilation_cache(cache_dir: str | os.PathLike | None = None) -> None:
    """Enable JAX's persistent compilation cache for this process.

    First-call latency of the jitted pipeline on a real TPU is dominated by
    XLA compilation (tens of seconds); the persistent cache makes every later
    process start hit the disk cache instead.  Called automatically on package
    import (set ``INFERCNVPY_TPU_NO_COMPILE_CACHE=1`` to opt out); safe to
    call again with a custom directory.
    """
    import jax

    path = Path(cache_dir) if cache_dir is not None else datasetdir / "xla_cache"
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def _auto_enable_compilation_cache() -> None:  # called from package __init__
    if os.environ.get("INFERCNVPY_TPU_NO_COMPILE_CACHE", "") not in ("", "0"):
        return
    try:
        enable_compilation_cache()
    except Exception:  # non-writable cache dir, exotic jax version — never fatal
        pass
