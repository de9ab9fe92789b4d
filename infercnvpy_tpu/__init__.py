"""infercnvpy_tpu — TPU-native copy-number-variation inference from scRNA-seq.

A standalone, TPU-first re-design of the capabilities of infercnvpy
(reference: icbi-lab/infercnvpy).  The compute path is JAX/XLA/Pallas;
everything runs without scanpy/anndata installed: the package ships its own
lightweight AnnData-compatible container (:mod:`infercnvpy_tpu.core`) plus
TPU implementations of PCA, kNN graphs, Leiden clustering, UMAP and t-SNE.

Namespace layout mirrors the reference (reference: src/infercnvpy/__init__.py:5-7):
``io`` / ``pp`` / ``tl`` / ``pl`` / ``datasets``.
"""

from . import datasets, io, parallel, pl, pp, tl  # noqa: E402
from .core import AnnData, read_h5ad, write_h5ad  # noqa: E402
from . import profiling, settings  # noqa: E402

settings._auto_enable_compilation_cache()

__all__ = [
    "datasets", "io", "parallel", "pl", "pp", "tl",
    "AnnData", "read_h5ad", "write_h5ad", "settings", "profiling",
]
__version__ = "0.1.0"
